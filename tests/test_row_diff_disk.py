"""Out-of-core staged RowDiff conversion must be bit-identical to the
in-memory builder (the reference's 3-stage convert_to_row_diff contract,
row_diff_builder.cpp:322-688: staging through disk never changes the
result)."""

import numpy as np
import pytest

from conftest import random_dna
from metagraph_tpu.anno.annotator import Annotation, LabelEncoder
from metagraph_tpu.anno.matrix import RowSparse
from metagraph_tpu.anno.row_diff import build_row_diff
from metagraph_tpu.anno.row_diff_disk import build_row_diff_staged
from metagraph_tpu.graph.boss_construct import build_boss
from metagraph_tpu.graph.dbg_succinct import DbgSuccinct


@pytest.fixture(scope="module")
def graph(rng):
    seqs = [random_dna(rng, 400) for _ in range(4)]
    return DbgSuccinct.from_boss(build_boss(seqs, 11))


def _save_column_file(path, rows_by_label, num_rows):
    enc = LabelEncoder()
    rr, cc = [], []
    for label, rows in rows_by_label:
        c = enc.insert(label)
        rr.append(np.asarray(rows, np.int64))
        cc.append(np.full(len(rows), c, np.int64))
    mat = RowSparse.from_coo(np.concatenate(rr), np.concatenate(cc),
                             num_rows, max(len(enc), 1))
    Annotation(matrix=mat, encoder=enc).save(path)
    return enc


def test_staged_matches_inmemory(rng, graph, tmp_path):
    N = graph.num_nodes()
    # two files, overlapping label sets, arbitrary row subsets
    f1 = str(tmp_path / "a.column.annodbg.npz")
    f2 = str(tmp_path / "b.column.annodbg.npz")
    def rand_rows():
        n = int(rng.integers(1, N))
        return np.unique(rng.integers(0, N, n))
    _save_column_file(f1, [("L0", rand_rows()), ("L1", rand_rows())], N)
    _save_column_file(f2, [("L1", rand_rows()), ("L2", rand_rows())], N)

    # tiny cap -> forces multiple spill runs + disk merges
    staged = build_row_diff_staged(
        [f1, f2], graph, swap_dir=str(tmp_path / "swap"), mem_cap_mb=0,
        max_length=8)

    # reference result: merge the files in memory, then build_row_diff
    merged = Annotation.merge([Annotation.load(f1), Annotation.load(f2)], N)
    expect = build_row_diff(merged.matrix, graph, max_length=8)

    assert staged.encoder.labels == merged.encoder.labels
    got = staged.matrix
    np.testing.assert_array_equal(np.asarray(got.diffs.rows),
                                  np.asarray(expect.diffs.rows))
    np.testing.assert_array_equal(np.asarray(got.diffs.cols),
                                  np.asarray(expect.diffs.cols))
    np.testing.assert_array_equal(got.anchor, expect.anchor)
    np.testing.assert_array_equal(got.succ, expect.succ)
    # and the decompressed matrix equals the source
    rows = np.arange(N)
    np.testing.assert_array_equal(got.get_rows_dense(rows),
                                  merged.matrix.presence(rows))


def test_staged_single_file_no_spill(rng, graph, tmp_path):
    N = graph.num_nodes()
    f1 = str(tmp_path / "c.column.annodbg.npz")
    rows = np.unique(rng.integers(0, N, N // 2))
    _save_column_file(f1, [("only", rows)], N)
    staged = build_row_diff_staged(
        [f1, ], graph, swap_dir=str(tmp_path / "swap2"), mem_cap_mb=64)
    expect = build_row_diff(Annotation.load(f1).matrix, graph)
    np.testing.assert_array_equal(np.asarray(staged.matrix.diffs.rows),
                                  np.asarray(expect.diffs.rows))
    np.testing.assert_array_equal(np.asarray(staged.matrix.diffs.cols),
                                  np.asarray(expect.diffs.cols))


def test_cli_disk_swap_roundtrip(rng, tmp_path, capsys):
    """`transform_anno --anno-type row_diff --disk-swap` must produce an
    annotation that queries identically to the in-memory conversion."""
    from metagraph_tpu.cli.main import main

    seqs = [random_dna(rng, 200) for _ in range(3)]
    fa = str(tmp_path / "in.fa")
    with open(fa, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">s{i}\n{s.decode() if isinstance(s, bytes) else s}\n")
    g = str(tmp_path / "g")
    main(["build", "-k", "11", "-o", g, fa])
    a = str(tmp_path / "a")
    main(["annotate", "-i", g, "-o", a, "--anno-header", fa])
    col = a + ".column.annodbg.npz"
    main(["transform_anno", "--anno-type", "row_diff", "-i", g,
          "-o", str(tmp_path / "mem"), col])
    main(["transform_anno", "--anno-type", "row_diff", "-i", g,
          "-o", str(tmp_path / "disk"), "--disk-swap",
          str(tmp_path / "swap"), "--mem-cap-gb", "0.000001", col])
    m = Annotation.load(str(tmp_path / "mem") + ".row_diff.annodbg.npz")
    d = Annotation.load(str(tmp_path / "disk") + ".row_diff.annodbg.npz")
    assert m.encoder.labels == d.encoder.labels
    np.testing.assert_array_equal(np.asarray(m.matrix.diffs.rows),
                                  np.asarray(d.matrix.diffs.rows))
    np.testing.assert_array_equal(np.asarray(m.matrix.diffs.cols),
                                  np.asarray(d.matrix.diffs.cols))


def test_int_staged_matches_inmemory(rng, graph, tmp_path):
    """Out-of-core IntRowDiff equals the in-memory builder, including
    multi-file inputs with shared labels (values summed)."""
    from metagraph_tpu.anno.row_diff import build_int_row_diff
    from metagraph_tpu.anno.row_diff_disk import build_int_row_diff_staged
    N = graph.num_nodes()

    def save_counts(path, rows_by_label):
        enc = LabelEncoder()
        rr, cc, vv = [], [], []
        for label, rows, vals in rows_by_label:
            c = enc.insert(label)
            rr.append(np.asarray(rows, np.int64))
            cc.append(np.full(len(rows), c, np.int64))
            vv.append(np.asarray(vals, np.int64))
        mat = RowSparse.from_coo(np.concatenate(rr), np.concatenate(cc),
                                 N, max(len(enc), 1),
                                 values=np.concatenate(vv))
        Annotation(matrix=mat, encoder=enc).save(path)

    def rand_rows_vals():
        n = int(rng.integers(1, N))
        rows = np.unique(rng.integers(0, N, n))
        return rows, rng.integers(1, 9, len(rows))

    f1 = str(tmp_path / "i1.column.annodbg.npz")
    f2 = str(tmp_path / "i2.column.annodbg.npz")
    r0 = rand_rows_vals()
    r1 = rand_rows_vals()
    r1b = rand_rows_vals()
    r2 = rand_rows_vals()
    save_counts(f1, [("L0", *r0), ("L1", *r1)])
    save_counts(f2, [("L1", *r1b), ("L2", *r2)])

    staged = build_int_row_diff_staged(
        [f1, f2], graph, swap_dir=str(tmp_path / "iswap"), mem_cap_mb=0,
        max_length=8)
    merged = Annotation.merge([Annotation.load(f1), Annotation.load(f2)], N)
    expect = build_int_row_diff(merged.matrix, graph, max_length=8)
    assert staged.encoder.labels == merged.encoder.labels
    got = staged.matrix
    np.testing.assert_array_equal(np.asarray(got.rows),
                                  np.asarray(expect.rows))
    np.testing.assert_array_equal(np.asarray(got.cols),
                                  np.asarray(expect.cols))
    np.testing.assert_array_equal(np.asarray(got.vals),
                                  np.asarray(expect.vals))
    # decompressed values equal the source
    rows = np.arange(N)
    np.testing.assert_array_equal(
        got.get_row_values_dense(rows),
        expect.get_row_values_dense(rows))
