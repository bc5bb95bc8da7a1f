"""Execution engines (layer L4): shell / grid / snapshot runners."""

from .HealpixRunner import (DefaultRunner, BaryonifyShell,
                            PaintProfilesShell, PaintProfilesAnisShell)
