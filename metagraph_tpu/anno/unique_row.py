"""Row-deduplicated annotation matrices (the "rainbow" family).

Re-design of the reference UniqueRowBinmat / Rainbowfish / Rainbow<BRWT>
(metagraph/src/annotation/binary_matrix/row_vector/unique_row_binmat.hpp:13,
rainbowfish/rainbowfish.hpp:16, binary_matrix.hpp:53 RainbowMatrix): many
graph rows share identical label sets, so rows are stored once as
distinct rows plus a per-row code vector. Queries become two gathers:
row -> code -> distinct-row content. The distinct-row store is any
matrix with the RowSparse query surface (RowSparse here; a Brwt can be
dropped in for the Rainbow<BRWT> configuration).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import jax.numpy as jnp
import numpy as np

from .matrix import RowSparse


@dataclass
class UniqueRow:
    codes: np.ndarray            # (num_rows,) int32 -> distinct row id
    distinct: RowSparse          # distinct rows matrix (num_distinct, C)
    num_rows: int

    @property
    def num_cols(self) -> int:
        return self.distinct.num_cols

    @property
    def num_distinct_rows(self) -> int:
        return self.distinct.num_rows

    @property
    def nnz(self) -> int:
        """Logical set-bit count (expanded)."""
        counts = np.bincount(np.asarray(self.distinct.rows),
                             minlength=self.num_distinct_rows)
        code_freq = np.bincount(self.codes, minlength=self.num_distinct_rows)
        return int((counts * code_freq).sum())

    @staticmethod
    def from_row_sparse(m: RowSparse) -> "UniqueRow":
        """Vectorized row deduplication: pad every row's column list to
        the max row width (-1 fill) and group identical rows with one
        np.unique(axis=0) — no per-row Python loop."""
        rows = np.asarray(m.rows)
        cols = np.asarray(m.cols)
        if m.num_rows == 0:
            return UniqueRow(codes=np.zeros(0, np.int32),
                             distinct=RowSparse.from_coo(
                                 np.zeros(0, np.int32), np.zeros(0, np.int32),
                                 1, m.num_cols), num_rows=0)
        counts = np.bincount(rows, minlength=m.num_rows)
        width = max(int(counts.max()), 1)
        padded = np.full((m.num_rows, width), -1, np.int32)
        offs = np.concatenate([[0], np.cumsum(counts)])
        pos = np.arange(len(rows)) - offs[rows]
        padded[rows, pos] = cols
        uniq, codes = np.unique(padded, axis=0, return_inverse=True)
        d_rows, d_pos = np.nonzero(uniq >= 0)
        d_cols = uniq[d_rows, d_pos]
        distinct = RowSparse.from_coo(
            d_rows.astype(np.int32), d_cols.astype(np.int32),
            max(uniq.shape[0], 1), m.num_cols, dedupe=False)
        return UniqueRow(codes=codes.astype(np.int32), distinct=distinct,
                         num_rows=m.num_rows)

    def with_brwt_distinct(self, subsample: int = 1_000_000) -> "UniqueRow":
        """Rainbow<BRWT> (rainbowfish/rainbow.hpp:15): the distinct-row
        store becomes a Multi-BRWT."""
        from .brwt import build_brwt
        distinct = self.distinct
        if not isinstance(distinct, RowSparse):
            distinct = distinct.to_row_sparse()
        return UniqueRow(codes=self.codes,
                         distinct=build_brwt(distinct, subsample=subsample),
                         num_rows=self.num_rows)

    # -- RowSparse-compatible query surface --------------------------------

    def presence(self, rows) -> np.ndarray:
        rows = np.asarray(rows)
        return np.asarray(self.distinct.presence(
            jnp.asarray(self.codes[rows])))

    def sum_rows(self, rows, weights) -> np.ndarray:
        return np.asarray(self.distinct.sum_rows(
            jnp.asarray(self.codes[np.asarray(rows)]),
            jnp.asarray(np.asarray(weights, np.int32))))

    def get_rows(self, rows: np.ndarray) -> List[List[int]]:
        dense = self.presence(rows)
        return [list(np.nonzero(r)[0]) for r in dense]

    def to_row_sparse(self) -> RowSparse:
        dm = self.distinct if isinstance(self.distinct, RowSparse) \
            else self.distinct.to_row_sparse()
        d_rows = np.asarray(dm.rows)
        d_cols = np.asarray(dm.cols)
        lo = np.searchsorted(d_rows, self.codes, side="left")
        hi = np.searchsorted(d_rows, self.codes, side="right")
        sizes = hi - lo
        out_r = np.repeat(np.arange(self.num_rows), sizes)
        flat = np.concatenate([np.arange(l, h) for l, h in zip(lo, hi)]) \
            if len(lo) else np.zeros(0, np.int64)
        out_c = d_cols[flat.astype(np.int64)]
        return RowSparse.from_coo(out_r.astype(np.int32),
                                  out_c.astype(np.int32),
                                  self.num_rows, self.num_cols,
                                  dedupe=False)

    # -- serialization -----------------------------------------------------

    def to_npz_dict(self) -> dict:
        if isinstance(self.distinct, RowSparse):
            d = self.distinct.to_npz_dict(prefix="ur_")
        else:
            # Rainbow<BRWT>: the distinct store is a Multi-BRWT
            d = self.distinct.to_npz_dict()
            d["ur_brwt"] = np.array(1)
        d["ur_codes"] = self.codes
        d["ur_num_rows"] = np.array(self.num_rows)
        return d

    @staticmethod
    def from_npz_dict(d) -> "UniqueRow":
        if "ur_brwt" in (d.keys() if hasattr(d, "keys") else d):
            from .brwt import Brwt
            distinct = Brwt.from_npz_dict(d)
        else:
            distinct = RowSparse.from_npz_dict(d, prefix="ur_")
        return UniqueRow(codes=np.asarray(d["ur_codes"]),
                         distinct=distinct,
                         num_rows=int(d["ur_num_rows"]))
