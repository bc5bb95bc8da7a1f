"""Support utilities: constants, IO data objects, tables, pixel windows."""

from . import constants
from .io import (HaloLightConeCatalog, HaloNDCatalog, LightconeShell,
                 GriddedMap, ParticleSnapshot)
from .Tabulate import (_set_parameter, _get_parameter, TabulatedProfile,
                       ParamTabulatedProfile, TabulatedCorrelation3D)
