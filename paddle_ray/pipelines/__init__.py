"""Dataset pipelines. Importing this package applies the upstream-bug
workarounds in paddle_ray.compat (hash-shuffle schema broadcast): every
driver-side entry point that can execute a join/hash-aggregate runs
through a pipeline module, while worker processes importing only
paddle_ray.stages/functions for UDF deserialization stay light."""

from .. import compat as _compat  # noqa: F401
