"""UrlFetcher — the S1 URL-input variant as an IO-bound actor-pool stage.

The reference accepts documents by URL and fetches them server-side
(`/root/reference/server/model_repo/layout-parsing/1/model.py:376,397`
via `utils.get_raw_bytes` / `utils.is_url`). The Ray-Data analogue is an
actor pool whose per-actor state is the connection pool, filling the
``html`` payload column for rows that carry a URL but no payload.

This sandbox has no network, so the DEFAULT fetch function raises
NotImplementedError (clearly-marked stub per the environment contract);
the plumbing — actor signature, batching, error-column semantics, payload
column fill — is real and tested with an injected fake fetcher. On a
networked cluster, pass ``fetch_fn=urllib-based callable`` (or construct
with ``UrlFetcher(cfg, fetch_fn=...)``).
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa

from ..core.config import ExtractConfig


def _default_fetch(url: str, timeout_s: float) -> bytes:
    raise NotImplementedError(
        "network fetch not available in this environment; inject fetch_fn"
    )


class UrlFetcher:
    """map_batches actor: fill empty ``html`` payloads by fetching ``url``.

    Rows that already carry a payload pass through untouched. Fetch
    failures never drop rows — the ``error`` column records them (422
    envelope analogue) and the payload stays empty.
    """

    def __init__(
        self,
        cfg: ExtractConfig | None = None,
        fetch_fn: Callable[[str, float], bytes] | None = None,
        timeout_s: float = 10.0,
    ):
        self.cfg = cfg or ExtractConfig()
        self.fetch = fetch_fn or _default_fetch  # one-time per actor (≙ client init)
        self.timeout_s = timeout_s

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        if "html" not in batch.column_names:
            need = np.ones(len(batch), dtype=bool)
        else:
            have = pc.fill_null(
                pc.greater(pc.binary_length(batch["html"]), pa.scalar(0)), False
            ).to_numpy(zero_copy_only=False)
            need = ~have
        if not need.any():
            # common pass-through: every payload already materialized —
            # the batch moves zero-copy (no to_pylist of MB-scale blobs)
            if "error" in batch.column_names:
                return batch
            return batch.append_column("error", pa.nulls(len(batch), pa.string()))

        urls = batch["url"].to_pylist()
        payloads = (
            batch["html"].to_pylist() if "html" in batch.column_names else [None] * len(urls)
        )
        errors = (
            batch["error"].to_pylist() if "error" in batch.column_names else [None] * len(urls)
        )
        out_payloads: list[bytes] = []
        for i, (url, payload) in enumerate(zip(urls, payloads)):
            if not need[i]:
                out_payloads.append(payload)
                continue
            try:
                out_payloads.append(self.fetch(url, self.timeout_s))
                # a retry pass that succeeds must clear the stale failure
                # record, or error-is-null filters drop the now-good row
                errors[i] = None
            except Exception as e:  # never drop a row
                out_payloads.append(b"")
                errors[i] = f"fetch: {type(e).__name__}: {e}"
        cols = {name: batch[name] for name in batch.column_names}
        cols["html"] = pa.array(out_payloads, pa.binary())
        cols["error"] = pa.array(errors, pa.string())
        return pa.table(cols)
