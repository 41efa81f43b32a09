from drake_ddp_tpu.utils.linalg import solve_spd, inv_spd

__all__ = ["solve_spd", "inv_spd"]
