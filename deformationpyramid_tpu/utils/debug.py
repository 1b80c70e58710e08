"""Debugging switches (SURVEY.md §5 race-detection/sanitizer analogue).

The reference's guards are ``torch.autograd.set_detect_anomaly(True)``
(``trainer.py:249``) and a NaN/Inf gradient filter (``lib/utils.py:103``).
JAX equivalents: global NaN checking and a checkify wrapper for the solver.
"""
from __future__ import annotations

from typing import Callable

import jax


def enable_nan_checks(enable: bool = True) -> None:
    """Raise on any NaN produced inside jitted code (jax_debug_nans).

    Slows execution (disables some fusion); use while debugging diverging
    solves, as the reference uses set_detect_anomaly during training.
    """
    jax.config.update("jax_debug_nans", enable)


def checkified(fn: Callable, *check_sets) -> Callable:
    """Wrap ``fn`` with jax.experimental.checkify for device-side assertions.

    Returns a function whose first output is the error set; call
    ``err.throw()`` on host to surface failures. Default checks: NaN + index
    OOB — the failure modes of the optimizer loop and gather-based chamfer.
    """
    from jax.experimental import checkify

    sets = check_sets or (checkify.nan_checks | checkify.index_checks,)
    errors = sets[0]
    for s in sets[1:]:
        errors = errors | s
    return checkify.checkify(fn, errors=errors)
