"""Adams-Moulton integrator (CVODES CV_ADAMS analog).

Variable-order Adams-Bashforth-Moulton predictor-corrector with functional
iteration for non-stiff problems (reference: CV_ADAMS,
include/cvodes/16_cvodes.h:23-24).  Implementation in progress — the
difference-array machinery is shared with ops/bdf.py but the corrector
identity and order constants differ.
"""

from __future__ import annotations

from sunode_tpu.ops.bdf import BDFOptions

__all__ = ["adams_options"]


def adams_options(options: BDFOptions) -> BDFOptions:
    raise NotImplementedError(
        "solver='ADAMS' is not implemented yet; use solver='BDF' "
        "(BDF handles non-stiff problems correctly, just with more Newton work)"
    )
