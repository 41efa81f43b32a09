from drake_ddp_tpu.mpc.driver import (
    MPCConfig,
    mpc_solve,
    shift_warm_start,
)

__all__ = ["MPCConfig", "mpc_solve", "shift_warm_start"]
