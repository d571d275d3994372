"""The ONE owner of local Ray session setup for surfaces that own a
session (bench.py, the job CLI, ad-hoc scripts). Library code and
__ray_entry__ must NOT call this — the external driver owns their
session (see package docstring)."""

from __future__ import annotations


def init_local_ray(num_cpus: int | None = None, logging_level: str | None = "ERROR") -> None:
    """Guarded local ray.init + progress-bar quiesce (idempotent)."""
    import ray

    if not ray.is_initialized():
        kw: dict = {"include_dashboard": False, "ignore_reinit_error": True}
        if num_cpus:
            kw["num_cpus"] = num_cpus
        if logging_level:
            kw["logging_level"] = logging_level
        ray.init(address="local", **kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
