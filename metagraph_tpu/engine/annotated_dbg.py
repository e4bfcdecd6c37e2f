"""AnnotatedDbg: graph + annotation join and the label-query engine.

Re-implements the reference AnnotatedDBG
(metagraph/src/graph/annotated_dbg.hpp:71-143, annotated_dbg.cpp:195-320)
with batched device math: a sequence's windows are mapped to nodes in one
searchsorted, per-label k-mer counts come from one interval-expand +
segment-sum over the annotation matrix, and the reference's exact
selection/ordering semantics are preserved:

  * anno row index = node - 1 (annotated_dbg.hpp:54-60);
  * min_count = max(1, ceil(presence_ratio * num_windows));
  * get_labels: labels with count >= min_count in label-code order;
  * get_top_labels: same set with counts; sorted by (count desc, code asc)
    and truncated only when more than num_top_labels survive
    (annotated_dbg.cpp top_labels<>).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..anno.annotator import Annotation, ColumnAnnotator
from ..graph.dbg_succinct import DbgSuccinct


@dataclass
class AnnotatedDbg:
    graph: DbgSuccinct
    annotation: Annotation

    @property
    def num_labels(self) -> int:
        return self.annotation.num_labels

    # -- mapping helpers ---------------------------------------------------

    def _map_rows(self, sequence: bytes | str) -> Tuple[np.ndarray, int]:
        """Anno row per window (-1 = not present) and total window count."""
        nodes = self.graph.map_to_nodes(sequence)
        if hasattr(self.graph, "node_to_anno_row"):
            rows = self.graph.node_to_anno_row(nodes)
            rows = np.where(nodes > 0, rows, -1)
            return rows, len(nodes)
        return nodes.astype(np.int64) - 1, len(nodes)

    def _label_counts(self, rows: np.ndarray) -> np.ndarray:
        """(num_labels,) k-mer hit count per label over present rows."""
        present = rows[rows >= 0].astype(np.int32)
        if present.size == 0:
            return np.zeros((self.num_labels,), np.int64)
        uniq, cnt = np.unique(present, return_counts=True)
        counts = self.annotation.matrix.sum_rows(
            jnp.asarray(uniq), jnp.asarray(cnt.astype(np.int32)))
        return np.asarray(counts).astype(np.int64)

    # -- queries (annotated_dbg.cpp semantics) ------------------------------

    def get_labels(self, sequence: bytes | str,
                   presence_ratio: float = 0.0) -> List[str]:
        if len(sequence) < self.graph.k:
            return []
        rows, num_windows = self._map_rows(sequence)
        num_present = int((rows >= 0).sum())
        min_count = max(1, math.ceil(presence_ratio * num_windows))
        if num_present < min_count:
            return []
        counts = self._label_counts(rows)
        return [self.annotation.encoder.decode(c)
                for c in np.nonzero(counts >= min_count)[0]]

    def get_top_labels(self, sequence: bytes | str,
                       num_top_labels: int = 2 ** 62,
                       presence_ratio: float = 0.0,
                       with_kmer_counts: bool = False
                       ) -> List[Tuple[str, int]]:
        if len(sequence) < self.graph.k:
            return []
        rows, num_windows = self._map_rows(sequence)
        num_present = int((rows >= 0).sum())
        min_count = max(1, math.ceil(presence_ratio * num_windows))
        if num_present < min_count:
            return []
        if with_kmer_counts:
            present = rows[rows >= 0].astype(np.int32)
            uniq, cnt = np.unique(present, return_counts=True)
            counts = np.asarray(self.annotation.matrix.sum_row_values(
                jnp.asarray(uniq), jnp.asarray(cnt.astype(np.int32))))
            # min_count filter still applies to binary presence counts
            bin_counts = self._label_counts(rows)
        else:
            counts = self._label_counts(rows)
            bin_counts = counts
        codes = np.nonzero(bin_counts >= min_count)[0]
        pairs = [(int(c), int(counts[c])) for c in codes]
        if len(pairs) > num_top_labels:
            pairs.sort(key=lambda p: (-p[1], p[0]))
            pairs = pairs[:num_top_labels]
        return [(self.annotation.encoder.decode(c), n) for c, n in pairs]

    def get_top_label_signatures(self, sequence: bytes | str,
                                 num_top_labels: int = 2 ** 62,
                                 presence_ratio: float = 0.0
                                 ) -> List[Tuple[str, np.ndarray]]:
        """Per-label boolean k-mer presence masks
        (annotated_dbg.cpp:500-560)."""
        if len(sequence) < self.graph.k:
            return []
        rows, num_windows = self._map_rows(sequence)
        num_present = int((rows >= 0).sum())
        min_count = max(1, math.ceil(presence_ratio * num_windows))
        if num_present < min_count:
            return []
        present_mask = rows >= 0
        present = rows[present_mask].astype(np.int32)
        uniq, inv = np.unique(present, return_inverse=True)
        pres = np.asarray(self.annotation.matrix.presence(jnp.asarray(uniq)))
        # expand back to window positions
        sig = np.zeros((num_windows, self.num_labels), bool)
        sig[np.nonzero(present_mask)[0]] = pres[inv]
        counts = sig.sum(axis=0)
        codes = np.nonzero(counts >= min_count)[0]
        pairs = sorted(((int(c), int(counts[c])) for c in codes),
                       key=lambda p: (-p[1], p[0]))
        if len(pairs) > num_top_labels:
            pairs = pairs[:num_top_labels]
        return [(self.annotation.encoder.decode(c), sig[:, c])
                for c, _ in pairs]

    def get_kmer_coordinates(self, sequence: bytes | str,
                             num_top_labels: int = 2 ** 62,
                             presence_ratio: float = 0.0
                             ) -> List[Tuple[str, List[List[int]]]]:
        """Per label: one coordinate tuple per query k-mer window
        (reference AnnotatedDBG::get_kmer_coordinates, used by
        --query-coords)."""
        from ..anno.coords import CoordMatrix
        assert isinstance(self.annotation.matrix, CoordMatrix), \
            "coordinate queries need a coordinate annotation"
        if len(sequence) < self.graph.k:
            return []
        rows, num_windows = self._map_rows(sequence)
        num_present = int((rows >= 0).sum())
        min_count = max(1, math.ceil(presence_ratio * num_windows))
        if num_present < min_count:
            return []
        counts = self._label_counts(rows)
        codes = np.nonzero(counts >= min_count)[0]
        pairs = sorted(((int(c), int(counts[c])) for c in codes),
                       key=lambda p: (-p[1], p[0]))[:num_top_labels]
        out = []
        m = self.annotation.matrix
        safe_rows = np.where(rows >= 0, rows, m.num_rows + 1)
        for c, _cnt in pairs:
            tuples = m.get_tuples(safe_rows, c)
            out.append((self.annotation.encoder.decode(c), tuples))
        return out

    def score_kmer_presence_mask(self, mask: np.ndarray,
                                 match_score: int = 1,
                                 mismatch_score: int = 2) -> float:
        """Alignment-free quality score of a presence mask
        (annotated_dbg.cpp:score_kmer_presence_mask)."""
        if mask.size == 0:
            return 0.0
        score = 0
        run = 0
        k = self.graph.k
        # contiguous stretches of present k-mers scored like exact matches
        for bit in mask:
            if bit:
                run += 1
            else:
                if run:
                    score += match_score * (run + k - 1)
                run = 0
        if run:
            score += match_score * (run + k - 1)
        return float(score)


def annotate_sequences(
    graph: DbgSuccinct,
    items: Sequence[Tuple[bytes, Sequence[str]]],
    annotator: Optional[ColumnAnnotator] = None,
    with_counts: bool = False,
) -> ColumnAnnotator:
    """Build a column annotation from (sequence, labels) pairs
    (reference cli/annotate.cpp:138-300): map each sequence's windows to
    nodes and set the labels on every present row."""
    if annotator is None:
        num_rows = graph.num_nodes()
        if hasattr(graph, "node_to_anno_row"):  # primary wrapper: base rows
            num_rows = graph.base.num_nodes()
        annotator = ColumnAnnotator(num_rows=num_rows)
    for seq, labels in items:
        nodes = graph.map_to_nodes(seq)
        if hasattr(graph, "node_to_anno_row"):
            rows = graph.node_to_anno_row(nodes[nodes > 0])
        else:
            rows = nodes[nodes > 0].astype(np.int64) - 1
        if with_counts:
            uniq, cnt = np.unique(rows, return_counts=True)
            for label in labels:
                annotator.add(uniq, label, values=cnt)
        else:
            rows = np.unique(rows)
            for label in labels:
                annotator.add(rows, label)
    return annotator
