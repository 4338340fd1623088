from .flagship import build_routed, run_pipeline, RunResult  # noqa: F401
