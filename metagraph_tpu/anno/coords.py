"""Coordinate annotations: per-(row, label) k-mer coordinate sets.

Re-design of the reference tuple matrices (TupleCSCMatrix,
metagraph/src/annotation/int_matrix/base/int_matrix.hpp:34,
tuple_csc_matrix.hpp:24) used by ``annotate --coordinates`` and
``query --query-coords``: coordinates are stored as flat (row, col,
coord) triples sorted lexicographically, so per-pair coordinate sets are
contiguous ranges found by one batched binary search — the same
interval-expand machinery as RowSparse.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


@dataclass
class CoordMatrix:
    rows: np.ndarray        # (nnz,) int64, sorted
    cols: np.ndarray        # (nnz,) int32, sorted within row
    coords: np.ndarray      # (nnz,) int64, sorted within (row, col)
    num_rows: int
    num_cols: int

    @property
    def nnz(self) -> int:
        return len(self.rows)

    @staticmethod
    def from_triples(rows, cols, coords, num_rows, num_cols) -> "CoordMatrix":
        rows = np.asarray(rows, np.int64)
        cols = np.asarray(cols, np.int32)
        coords = np.asarray(coords, np.int64)
        order = np.lexsort((coords, cols, rows))
        rows, cols, coords = rows[order], cols[order], coords[order]
        # dedupe exact triples
        if len(rows):
            keep = np.concatenate([[True],
                                   (rows[1:] != rows[:-1])
                                   | (cols[1:] != cols[:-1])
                                   | (coords[1:] != coords[:-1])])
            rows, cols, coords = rows[keep], cols[keep], coords[keep]
        return CoordMatrix(rows, cols, coords, num_rows, num_cols)

    def pair_key(self, r, c):
        return np.asarray(r, np.int64) * self.num_cols + np.asarray(c, np.int64)

    def get_tuples(self, query_rows: np.ndarray, col: int
                   ) -> List[List[int]]:
        """Coordinate tuple per query row for one label column
        (reference MultiIntMatrix::get_row_tuples)."""
        keys = self.pair_key(self.rows, self.cols)
        q = self.pair_key(query_rows, np.full(len(query_rows), col))
        lo = np.searchsorted(keys, q, side="left")
        hi = np.searchsorted(keys, q, side="right")
        return [list(self.coords[l:h]) for l, h in zip(lo, hi)]

    def columns_of_rows(self, query_rows: np.ndarray) -> np.ndarray:
        """(Q, num_cols) bool presence."""
        out = np.zeros((len(query_rows), self.num_cols), bool)
        keys = self.rows
        lo = np.searchsorted(keys, query_rows, side="left")
        hi = np.searchsorted(keys, query_rows, side="right")
        for i, (l, h) in enumerate(zip(lo, hi)):
            out[i, np.unique(self.cols[l:h])] = True
        return out

    # serialization inside the Annotation container
    def to_npz_dict(self) -> dict:
        return {"coord_rows": self.rows, "coord_cols": self.cols,
                "coord_coords": self.coords,
                "coord_shape": np.array([self.num_rows, self.num_cols])}

    @staticmethod
    def from_npz_dict(d) -> "CoordMatrix":
        shape = d["coord_shape"]
        return CoordMatrix(np.asarray(d["coord_rows"]),
                           np.asarray(d["coord_cols"]),
                           np.asarray(d["coord_coords"]),
                           int(shape[0]), int(shape[1]))

    # RowSparse-compatible query surface (binary part)
    def presence(self, rows) -> np.ndarray:
        return self.columns_of_rows(np.asarray(rows))

    def sum_rows(self, rows, weights) -> np.ndarray:
        dense = self.columns_of_rows(np.asarray(rows))
        return (dense * np.asarray(weights)[:, None]).sum(axis=0)


class CoordAnnotator:
    """Accumulates (row, label, coordinate) triples during annotation
    (reference annotate.cpp:384 annotate_coordinates)."""

    def __init__(self, num_rows: int):
        from .annotator import LabelEncoder
        self.num_rows = num_rows
        self.encoder = LabelEncoder()
        self._r: List[np.ndarray] = []
        self._c: List[np.ndarray] = []
        self._x: List[np.ndarray] = []

    def add(self, rows: np.ndarray, label: str, coords: np.ndarray):
        code = self.encoder.insert(label)
        rows = np.asarray(rows, np.int64)
        self._r.append(rows)
        self._c.append(np.full(len(rows), code, np.int32))
        self._x.append(np.asarray(coords, np.int64))

    def finalize(self):
        from .annotator import Annotation
        if self._r:
            r = np.concatenate(self._r)
            c = np.concatenate(self._c)
            x = np.concatenate(self._x)
        else:
            r = np.zeros(0, np.int64)
            c = np.zeros(0, np.int32)
            x = np.zeros(0, np.int64)
        mat = CoordMatrix.from_triples(r, c, x, self.num_rows,
                                       max(len(self.encoder), 1))
        return Annotation(matrix=mat, encoder=self.encoder)


def annotate_coordinates(graph, items: Sequence[Tuple[bytes, Sequence[str]]],
                         annotator: CoordAnnotator = None) -> CoordAnnotator:
    """items: (sequence, labels); coordinate of window i in a sequence is
    its offset within that sequence's coordinate space (consecutive
    sequences of one label continue the coordinate axis, as the
    reference's per-file coordinate systems do)."""
    if annotator is None:
        num_rows = graph.num_nodes()
        if hasattr(graph, "node_to_anno_row"):
            num_rows = graph.base.num_nodes()
        annotator = CoordAnnotator(num_rows=num_rows)
    offsets = {}
    for seq, labels in items:
        nodes = graph.map_to_nodes(seq)
        present = nodes > 0
        if hasattr(graph, "node_to_anno_row"):
            rows = graph.node_to_anno_row(nodes[present])
        else:
            rows = nodes[present].astype(np.int64) - 1
        for label in labels:
            off = offsets.get(label, 0)
            coords = off + np.nonzero(present)[0]
            annotator.add(rows, label, coords)
            offsets[label] = off + len(nodes)
    return annotator
