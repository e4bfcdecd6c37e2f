"""Integer (count) annotation matrices over a BRWT-compressed pattern.

Covers the reference's IntMultiBRWT (``int_brwt``) and IntRowDiffBRWT
(``row_diff_int_brwt``) annotator targets
(metagraph/src/annotation/representation/annotation_matrix/
static_annotators_def.hpp:26-58; int matrix backends
int_matrix/rank_extended/csc_matrix.hpp:22 and
int_matrix/row_diff/int_row_diff.hpp:48).

Representation: the binary presence pattern lives in a Multi-BRWT
(anno/brwt.py) and the values live in ONE flat array in row-major
(row, col) rank order, indexed by a per-row pointer array. Columns are
never stored explicitly — a value lookup asks the BRWT for the row's
presence pattern and matches its set columns (ascending) against the
row's value slice, mirroring the reference's rank-extended columns
(CSCMatrix keeps values in column-rank order; we keep row-rank order
because our BRWT descent returns whole rows).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np

from .brwt import Brwt, build_brwt
from .matrix import RowSparse


def _row_major_values(matrix: RowSparse):
    """(row_ptr (R+1,) int64, vals int64) of a values COO in row-major
    (row, col) order."""
    rows = np.asarray(matrix.rows).astype(np.int64)
    cols = np.asarray(matrix.cols).astype(np.int64)
    vals = np.asarray(matrix.values).astype(np.int64)
    order = np.lexsort((cols, rows))
    rows, vals = rows[order], vals[order]
    row_ptr = np.searchsorted(rows, np.arange(matrix.num_rows + 1))
    return row_ptr.astype(np.int64), vals


def _fill_dense_values(pres: np.ndarray, rows: np.ndarray,
                       row_ptr: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """(Q, C) int64 dense values: the pattern supplies the columns
    (ascending per row via np.nonzero's row-major order), the flat value
    array supplies the numbers."""
    Q, C = pres.shape
    dense = np.zeros((Q, C), np.int64)
    if not pres.any():
        return dense
    qq, cc = np.nonzero(pres)
    starts = np.searchsorted(qq, np.arange(Q))
    offs = np.arange(len(qq), dtype=np.int64) - starts[qq]
    dense[qq, cc] = vals[row_ptr[rows[qq]] + offs]
    return dense


@dataclass
class IntBrwt:
    """Count annotation: BRWT pattern + flat row-major values
    (reference IntMultiBRWT, ``--anno-type int_brwt``)."""
    pattern: Brwt
    row_ptr: np.ndarray          # (num_rows + 1,) int64
    vals: np.ndarray             # (nnz,) int64

    @property
    def num_rows(self) -> int:
        return self.pattern.num_rows

    @property
    def num_cols(self) -> int:
        return self.pattern.num_cols

    @property
    def nnz(self) -> int:
        return len(self.vals)

    @property
    def values(self):
        return self.vals

    # -- binary surface ----------------------------------------------------

    def presence(self, rows) -> np.ndarray:
        return self.pattern.presence(rows)

    def get_rows_dense(self, rows) -> np.ndarray:
        return self.pattern.presence(rows)

    def sum_rows(self, rows, weights) -> np.ndarray:
        return self.pattern.sum_rows(rows, weights)

    # -- integer surface ---------------------------------------------------

    def get_row_values_dense(self, rows: np.ndarray) -> np.ndarray:
        rows = np.asarray(rows, np.int64)
        pres = self.pattern.presence(rows)
        return _fill_dense_values(pres, rows, self.row_ptr, self.vals)

    def sum_row_values(self, rows, weights) -> np.ndarray:
        dense = self.get_row_values_dense(np.asarray(rows))
        return (dense * np.asarray(weights)[:, None]).sum(axis=0)

    def row_values_list(self, rows: np.ndarray):
        dense = self.get_row_values_dense(np.asarray(rows))
        q, c = np.nonzero(dense)
        return c, dense[q, c]

    def to_row_sparse(self) -> RowSparse:
        rs = self.pattern.to_row_sparse()
        rows = np.asarray(rs.rows).astype(np.int64)
        cols = np.asarray(rs.cols).astype(np.int64)
        order = np.lexsort((cols, rows))
        v = np.zeros(len(rows), np.int64)
        v[order] = self.vals[:len(rows)]
        return RowSparse.from_coo(rows, cols, self.num_rows,
                                  self.num_cols, values=v)

    # -- serialization -----------------------------------------------------

    def to_npz_dict(self) -> dict:
        d = self.pattern.to_npz_dict()
        d["ibrwt_ptr"] = self.row_ptr
        d["ibrwt_vals"] = self.vals
        return d

    @staticmethod
    def from_npz_dict(d) -> "IntBrwt":
        return IntBrwt(pattern=Brwt.from_npz_dict(d),
                       row_ptr=np.asarray(d["ibrwt_ptr"]),
                       vals=np.asarray(d["ibrwt_vals"]))


@dataclass
class IntRowDiffBrwt:
    """Count annotation delta-compressed along rd-successor paths with a
    BRWT-compressed delta pattern (reference IntRowDiffBRWT,
    ``--anno-type row_diff_int_brwt``). Queries walk to the anchor
    summing value deltas fetched through the pattern."""
    diffs: IntBrwt               # delta pattern + delta values
    anchor: np.ndarray
    succ: np.ndarray
    max_length: int

    @property
    def num_rows(self) -> int:
        return self.diffs.num_rows

    @property
    def num_cols(self) -> int:
        return self.diffs.num_cols

    @property
    def nnz(self) -> int:
        return self.diffs.nnz

    def num_anchors(self) -> int:
        return int(self.anchor.sum())

    def get_row_values_dense(self, rows: np.ndarray) -> np.ndarray:
        rows = np.asarray(rows, np.int64)
        Q = len(rows)
        acc = np.zeros((Q, self.num_cols), np.int64)
        cur = rows.copy()
        done = np.zeros(Q, bool)
        for _ in range(self.max_length + 1):
            if done.all():
                break
            curc = np.clip(cur, 0, self.num_rows - 1)
            delta = self.diffs.get_row_values_dense(curc)
            acc += np.where(done[:, None], 0, delta)
            done |= self.anchor[curc] & ~done
            nxt = self.succ[curc]
            done |= (nxt < 0) & ~done
            cur = np.where(done, cur, nxt)
        return acc

    def presence(self, rows) -> np.ndarray:
        return self.get_row_values_dense(np.asarray(rows)) > 0

    def sum_rows(self, rows, weights) -> np.ndarray:
        dense = self.presence(rows)
        return (dense * np.asarray(weights)[:, None]).sum(axis=0)

    def sum_row_values(self, rows, weights) -> np.ndarray:
        dense = self.get_row_values_dense(np.asarray(rows))
        return (dense * np.asarray(weights)[:, None]).sum(axis=0)

    def row_values_list(self, rows: np.ndarray):
        dense = self.get_row_values_dense(np.asarray(rows))
        q, c = np.nonzero(dense)
        return c, dense[q, c]

    def to_npz_dict(self) -> dict:
        d = self.diffs.to_npz_dict()
        d["irdb_anchor"] = np.packbits(self.anchor)
        d["irdb_anchor_len"] = np.array(len(self.anchor))
        d["irdb_succ"] = self.succ
        d["irdb_max_length"] = np.array(self.max_length)
        return d

    @staticmethod
    def from_npz_dict(d) -> "IntRowDiffBrwt":
        n = int(d["irdb_anchor_len"])
        return IntRowDiffBrwt(
            diffs=IntBrwt.from_npz_dict(d),
            anchor=np.unpackbits(d["irdb_anchor"])[:n].astype(bool),
            succ=np.asarray(d["irdb_succ"]),
            max_length=int(d["irdb_max_length"]))


def build_int_brwt(matrix: RowSparse, arity: int = 2,
                   subsample: int = 1_000_000, linkage=None) -> IntBrwt:
    """Build the int_brwt target from a values COO annotation."""
    assert matrix.values is not None, "int_brwt needs a count annotation"
    pattern = build_brwt(matrix, arity=arity, subsample=subsample,
                         linkage=linkage)
    row_ptr, vals = _row_major_values(matrix)
    return IntBrwt(pattern=pattern, row_ptr=row_ptr, vals=vals)


def build_int_row_diff_brwt(matrix: RowSparse, graph,
                            max_length: int = 64,
                            arity: int = 2,
                            subsample: int = 1_000_000,
                            row_counts=None, row_reduction=None
                            ) -> IntRowDiffBrwt:
    """row_diff_int_brwt: IntRowDiff deltas re-hosted on a BRWT pattern."""
    from .row_diff import build_int_row_diff
    ird = build_int_row_diff(matrix, graph, max_length=max_length,
                             row_counts=row_counts,
                             row_reduction=row_reduction)
    delta = RowSparse.from_coo(ird.rows, ird.cols, ird.num_rows,
                               ird.num_cols, values=ird.vals,
                               dedupe=False)
    return IntRowDiffBrwt(
        diffs=build_int_brwt(delta, arity=arity, subsample=subsample),
        anchor=ird.anchor, succ=ird.succ, max_length=ird.max_length)
