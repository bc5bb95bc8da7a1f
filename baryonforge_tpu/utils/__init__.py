"""Support utilities: constants, IO data objects, tables, pixel windows."""

from . import constants
