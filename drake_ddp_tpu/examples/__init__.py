"""The seven reference tasks (SURVEY.md §2.2), as typed-config modules.

Each module exposes:
    Config   — frozen dataclass of the reference script's module-level
               constants (so a scenario batch is a pytree of configs),
    build_system(cfg)  — the DiscreteSystem to optimize over,
    build_problem(cfg, system) — the ILQRProblem,
    run(cfg) — solve and return results (printing the reference-style
               summary), used by `python -m drake_ddp_tpu.examples.<task>`.
"""
