"""The ONE owner of local Ray session setup for surfaces that own a
session (bench.py, the job CLI, ad-hoc scripts). Library code and
__ray_entry__ must NOT call this — the external driver owns their
session (see package docstring)."""

from __future__ import annotations


def init_local_ray(num_cpus: int | None = None, logging_level: str | None = "ERROR") -> None:
    """Guarded ray.init + progress-bar quiesce (idempotent). Local by
    default; when RAY_ADDRESS names a real cluster (anything other than
    "local" — e.g. set by `ray job submit`'s runtime for the entrypoint
    process), connect to it instead of forking a private local instance
    (num_cpus is a local-instance knob and is ignored on connect)."""
    import os

    import ray

    if not ray.is_initialized():
        addr = os.environ.get("RAY_ADDRESS") or "local"
        if addr == "local":
            kw: dict = {"include_dashboard": False, "ignore_reinit_error": True}
            if num_cpus:
                kw["num_cpus"] = num_cpus
            if logging_level:
                kw["logging_level"] = logging_level
            # forced-spill knob for memory-pressure benchmarking: cap the
            # plasma store (bytes) so the streaming pipeline must spill to
            # disk instead of riding a 128 GiB store the sandbox never
            # fills — the behavior a real 100 TB cluster node hits first
            osm = os.environ.get("RAY_GRAFT_OBJECT_STORE_BYTES")
            if osm:
                kw["object_store_memory"] = int(osm)
            ray.init(address="local", **kw)
        else:
            # auto-detect the hosting cluster; new-instance knobs
            # (num_cpus, include_dashboard) don't apply on connect
            ray.init(ignore_reinit_error=True)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
