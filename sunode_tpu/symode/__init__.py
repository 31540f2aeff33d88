from sunode_tpu.symode.problem import SympyProblem
from sunode_tpu.symode.lambdify import (
    lambdify_jax,
    logaddexp,
    expit,
    dexpit,
    CardinalBSpline,
    interpolate_spline,
)

__all__ = [
    "SympyProblem",
    "lambdify_jax",
    "logaddexp",
    "expit",
    "dexpit",
    "CardinalBSpline",
    "interpolate_spline",
]
