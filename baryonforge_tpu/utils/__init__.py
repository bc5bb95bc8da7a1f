"""Support utilities: constants, IO data objects, tables, pixel windows."""

from . import constants
from .io import (HaloLightConeCatalog, HaloNDCatalog, LightconeShell,
                 GriddedMap, ParticleSnapshot)
from .Tabulate import (_set_parameter, _get_parameter, TabulatedProfile,
                       ParamTabulatedProfile, TabulatedCorrelation3D)
from .Pixel import ConvolvedProfile, GridPixelApprox, HealPixel, NoPix
from .Cache import SimpleArrayCache, CachedProfile, CachedHODProfile
from .misc import (safe_Pchip_minimize, destory_Pk, destroy_Pk,
                   combine_fftpars, log_time)
from . import debug
from .fitsio import read_healpix_fits, write_healpix_fits
from .Parallelize import SimpleParallel, SplitJoinParallel
from . import halomodel
from .halomodel import FlexibleHMCalculator
