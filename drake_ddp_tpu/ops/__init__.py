"""Pallas TPU kernels for the hot ops (SURVEY.md §7 step 8)."""

from drake_ddp_tpu.ops.megastep import make_pallas_step  # noqa: F401
