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
        rows = np.asarray(m.rows)
        cols = np.asarray(m.cols)
        # row signature = sorted tuple of columns; hash rows via sorting
        # their (row, col) pairs which are already sorted
        # build per-row column-lists boundaries
        starts = np.searchsorted(rows, np.arange(m.num_rows), side="left")
        ends = np.searchsorted(rows, np.arange(m.num_rows), side="right")
        sigs = {}
        codes = np.zeros(m.num_rows, np.int32)
        d_rows: List[int] = []
        d_cols: List[int] = []
        for r in range(m.num_rows):
            sig = tuple(cols[starts[r]:ends[r]])
            code = sigs.get(sig)
            if code is None:
                code = len(sigs)
                sigs[sig] = code
                for c in sig:
                    d_rows.append(code)
                    d_cols.append(int(c))
            codes[r] = code
        distinct = RowSparse.from_coo(
            np.array(d_rows, np.int32), np.array(d_cols, np.int32),
            max(len(sigs), 1), m.num_cols, dedupe=False)
        return UniqueRow(codes=codes, distinct=distinct,
                         num_rows=m.num_rows)

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
        out_r, out_c = [], []
        d_rows = np.asarray(self.distinct.rows)
        d_cols = np.asarray(self.distinct.cols)
        for r in range(self.num_rows):
            code = self.codes[r]
            lo = np.searchsorted(d_rows, code, side="left")
            hi = np.searchsorted(d_rows, code, side="right")
            out_r.extend([r] * (hi - lo))
            out_c.extend(d_cols[lo:hi])
        return RowSparse.from_coo(np.array(out_r, np.int32),
                                  np.array(out_c, np.int32),
                                  self.num_rows, self.num_cols,
                                  dedupe=False)

    # -- serialization -----------------------------------------------------

    def to_npz_dict(self) -> dict:
        d = self.distinct.to_npz_dict(prefix="ur_")
        d["ur_codes"] = self.codes
        d["ur_num_rows"] = np.array(self.num_rows)
        return d

    @staticmethod
    def from_npz_dict(d) -> "UniqueRow":
        return UniqueRow(codes=np.asarray(d["ur_codes"]),
                         distinct=RowSparse.from_npz_dict(d, prefix="ur_"),
                         num_rows=int(d["ur_num_rows"]))
