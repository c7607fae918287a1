"""Incremental aggregation (materialized-view maintenance): keep a
running aggregate over a GROWING sharded corpus, paying only for the
shards that arrived since the last tick.

The 100-TB operational reality is a corpus that grows by a daily/hourly
drop of new shard files; recomputing a corpus-wide statistic from
scratch per drop is O(corpus) when the new work is O(drop). This module
implements the pattern for any MERGEABLE aggregate (sums/counts/min/max
— here per-language doc/char/token totals):

- tick = ``update_lang_stats(shards_dir, state_dir)``: list the shard
  files, subtract the ones recorded in the committed state, scan ONLY
  the new ones (a distributed pruned read + per-batch partials + a
  ≤ |langs|-row exchange — the lang_dist kernel), merge the tiny result
  into the state rows, and commit.
- the state commit is ATOMIC and exactly-once per shard: state is one
  JSON file (aggregate rows + the processed-shard list) written
  tmp→``os.replace``; a crash mid-tick leaves the previous state intact
  and the next tick redoes the same new shards (their contribution was
  never merged, so the redo is not a double count).
- state size is O(|langs|), never O(corpus) — the merge is driver-side
  by design, same rule as the rollup cascade's driver finish.

The reference has no incremental surface (its store/queue state dies
with the process — SURVEY §4.1 "Checkpoint/resume: None"); this is the
training-data side's analogue of the crawl driver's round manifests.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

import pyarrow as pa
import ray.data

__all__ = ["update_lang_stats", "read_lang_stats"]

_STATE = "lang_stats_state.json"


def _state_path(state_dir: str) -> str:
    return os.path.join(state_dir, _STATE)


def _load_state(state_dir: str) -> dict:
    try:
        with open(_state_path(state_dir)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {"shards": [], "rows": {}}


def _commit_state(state_dir: str, state: dict) -> None:
    os.makedirs(state_dir, exist_ok=True)
    tmp = _state_path(state_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, sort_keys=True)
    os.replace(tmp, _state_path(state_dir))


def _stats_table(rows: dict) -> pa.Table:
    langs = sorted(rows)
    return pa.table(
        {
            "lang": pa.array(langs, pa.string()),
            "n_docs": pa.array([rows[l][0] for l in langs], pa.int64()),
            "n_chars": pa.array([rows[l][1] for l in langs], pa.int64()),
            "n_tokens": pa.array([rows[l][2] for l in langs], pa.int64()),
        }
    )


def read_lang_stats(state_dir: str) -> pa.Table:
    """Current committed view (no scan)."""
    return _stats_table(_load_state(state_dir)["rows"])


def _partial(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    toks = pa.array(
        [t.count(" ") + 1 for t in batch.column("text").to_pylist()], pa.int64()
    )
    t = pa.table(
        {
            "lang": batch.column("lang"),
            "n_docs": pa.array([1] * batch.num_rows, pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(batch.column("text")), pa.int64()),
            "n_tokens": toks,
        }
    )
    g = t.group_by("lang").aggregate(
        [("n_docs", "sum"), ("n_chars", "sum"), ("n_tokens", "sum")]
    )
    return pa.table(
        {
            "lang": g.column("lang"),
            "n_docs": g.column("n_docs_sum"),
            "n_chars": g.column("n_chars_sum"),
            "n_tokens": g.column("n_tokens_sum"),
        }
    )


def update_lang_stats(
    shards_dir: str, state_dir: str, shard_paths: Sequence[str] | None = None
) -> pa.Table:
    """One incremental tick: fold any NEW shards under ``shards_dir``
    (``*.parquet``, by file name) into the committed per-language
    totals; return the updated view. A tick with no new shards is a
    no-op read."""
    from ray.data.aggregate import Sum

    state = _load_state(state_dir)
    done = set(state["shards"])
    if shard_paths is None:
        shard_paths = sorted(
            e.name for e in os.scandir(shards_dir) if e.name.endswith(".parquet")
        )
    new = [s for s in shard_paths if s not in done]
    if not new:
        return _stats_table(state["rows"])

    agg = (
        ray.data.read_parquet(
            [os.path.join(shards_dir, s) for s in new], columns=["lang", "text"]
        )
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_chars", alias_name="n_chars"),
            Sum("n_tokens", alias_name="n_tokens"),
        )
    )
    rows = state["rows"]
    for r in agg.take_all():  # ≤ |langs| rows — bounded at any corpus size
        cur = rows.get(r["lang"], [0, 0, 0])
        rows[r["lang"]] = [
            cur[0] + r["n_docs"],
            cur[1] + r["n_chars"],
            cur[2] + r["n_tokens"],
        ]
    state["shards"] = sorted(done | set(new))
    _commit_state(state_dir, state)
    return _stats_table(rows)
