from drake_ddp_tpu.dynamics.base import DiscreteSystem
from drake_ddp_tpu.dynamics.analytic import (
    pendulum_system,
    cart_pole_system,
    acrobot_system,
)

__all__ = [
    "DiscreteSystem",
    "pendulum_system",
    "cart_pole_system",
    "acrobot_system",
]
