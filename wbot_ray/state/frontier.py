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
"""

from __future__ import annotations

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["ParquetFrontier"]


class ParquetFrontier:
    def __init__(self, workdir: str) -> None:
        self.root = os.path.join(workdir, "frontier")

    # -- layout --------------------------------------------------------
    def round_dir(self, d: int) -> str:
        return os.path.join(self.root, f"round={d}")

    def files(self) -> list[str]:
        """Every round's files, sorted (the visited-surface read)."""
        return sorted(glob.glob(os.path.join(self.root, "round=*", "*.parquet")))

    def rows(self, d: int) -> int:
        return sum(
            pq.read_metadata(f).num_rows
            for f in glob.glob(os.path.join(self.round_dir(d), "*.parquet"))
        )

    # -- lifecycle -----------------------------------------------------
    def clear_all(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)

    def clear_rounds_after(self, start: int) -> None:
        """Wipe rounds strictly beyond ``start`` (un-committed state)."""
        for stale in glob.glob(os.path.join(self.root, "round=*")):
            if int(stale.rsplit("=", 1)[1]) > start:
                shutil.rmtree(stale, ignore_errors=True)

    # -- write (push) --------------------------------------------------
    def write_table(self, d: int, tbl: pa.Table) -> None:
        """Atomically (re)write round ``d`` as one file."""
        dir_ = self.round_dir(d)
        shutil.rmtree(dir_, ignore_errors=True)
        os.makedirs(dir_, exist_ok=True)
        tmp = os.path.join(dir_, ".part-0.tmp")
        pq.write_table(tbl, tmp)
        os.replace(tmp, os.path.join(dir_, "part-0.parquet"))

    def prepare_round_dir(self, d: int) -> str:
        """Clean slate for a distributed (multi-file) round write."""
        dir_ = self.round_dir(d)
        shutil.rmtree(dir_, ignore_errors=True)
        os.makedirs(dir_, exist_ok=True)
        return dir_

    # -- read (pop) ----------------------------------------------------
    def read_table(self, d: int) -> pa.Table:
        return pa.concat_tables(
            pq.read_table(f)
            for f in sorted(glob.glob(os.path.join(self.round_dir(d), "*.parquet")))
        )

    def read_dataset(
        self,
        d: int,
        columns: list[str] | None = None,
        override_num_blocks: int | None = None,
    ):
        import ray.data

        return ray.data.read_parquet(
            self.round_dir(d),
            columns=columns,
            override_num_blocks=override_num_blocks,
        )
