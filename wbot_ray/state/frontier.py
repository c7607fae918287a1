"""Round-partitioned Parquet frontier — the engine's Queue seam.

The reference exposes a pluggable FIFO queue (``WithQueue``,
``/root/reference/option.go:54-58``; ``pkg/api/wbot.go:48-53``). In the
Ray engine there is no per-request queue object: the depth-``d``
frontier IS a dataset, checkpointed as ``frontier/round=<d>/*.parquet``
in dense ``crawl_ord`` order — push = writing round ``d+1``, pop =
reading round ``d``. This class owns that layout; swap it via
``CrawlConfig.queue_factory`` (e.g. to put rounds on object storage, or
to mirror pushes into an external system). A replacement must keep the
contract: ``read_*`` of a round returns exactly the rows ``write_*``
persisted for it, with the written schema and no duplication.

All IO routes through ``wbot_ray.fsio``, so the workdir may be an
fsspec URL (shared storage) as well as a local path.
"""

from __future__ import annotations

import pyarrow as pa

from wbot_ray import fsio

__all__ = ["ParquetFrontier"]


class ParquetFrontier:
    def __init__(self, workdir: str) -> None:
        self.root = fsio.join(workdir, "frontier")

    # -- layout --------------------------------------------------------
    def round_dir(self, d: int) -> str:
        return fsio.join(self.root, f"round={d}")

    def files(self) -> list[str]:
        """Every round's files, sorted (the visited-surface read)."""
        return fsio.glob(fsio.join(self.root, "round=*", "*.parquet"))

    def rows(self, d: int) -> int:
        return sum(
            fsio.parquet_num_rows(f)
            for f in fsio.glob(fsio.join(self.round_dir(d), "*.parquet"))
        )

    # -- lifecycle -----------------------------------------------------
    def clear_all(self) -> None:
        fsio.rmtree(self.root)

    def clear_rounds_after(self, start: int) -> None:
        """Wipe rounds strictly beyond ``start`` (un-committed state)."""
        for stale in fsio.glob(fsio.join(self.root, "round=*")):
            if int(stale.rsplit("=", 1)[1]) > start:
                fsio.rmtree(stale)

    # -- write (push) --------------------------------------------------
    def write_table(self, d: int, tbl: pa.Table) -> None:
        """Atomically (re)write round ``d`` as one file."""
        dir_ = self.round_dir(d)
        fsio.rmtree(dir_)
        fsio.makedirs(dir_)
        fsio.write_parquet_atomic(tbl, fsio.join(dir_, "part-0.parquet"))

    def prepare_round_dir(self, d: int) -> str:
        """Clean slate for a distributed (multi-file) round write."""
        dir_ = self.round_dir(d)
        fsio.rmtree(dir_)
        fsio.makedirs(dir_)
        return dir_

    # -- read (pop) ----------------------------------------------------
    def read_table(self, d: int) -> pa.Table:
        return pa.concat_tables(
            fsio.read_parquet_table(f)
            for f in fsio.glob(fsio.join(self.round_dir(d), "*.parquet"))
        )

    def read_dataset(
        self,
        d: int,
        columns: list[str] | None = None,
        override_num_blocks: int | None = None,
    ):
        import ray.data

        fs, path = fsio.pa_filesystem(self.round_dir(d))
        return ray.data.read_parquet(
            path,
            filesystem=fs,
            columns=columns,
            override_num_blocks=override_num_blocks,
        )
