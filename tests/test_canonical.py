"""PRIMARY mode + CanonicalDbg wrapper tests: the wrapper over a primary
graph must behave like the canonical closure graph."""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import random_dna
from metagraph_tpu.align.aligner import _revcomp
from metagraph_tpu.engine.annotated_dbg import AnnotatedDbg, annotate_sequences
from metagraph_tpu.graph.boss_construct import build_boss
from metagraph_tpu.graph.canonical import CanonicalDbg
from metagraph_tpu.graph.dbg_succinct import DbgSuccinct
from metagraph_tpu.kmer.alphabets import DNA

K = 9


@pytest.fixture(scope="module")
def graphs():
    rng = np.random.default_rng(11)
    seqs = [random_dna(rng, 150) for _ in range(3)]
    primary = DbgSuccinct.from_boss(build_boss(seqs, K, mode="primary"),
                                    DNA, "primary")
    canonical = DbgSuccinct.from_boss(build_boss(seqs, K, mode="canonical"),
                                      DNA, "canonical")
    return CanonicalDbg(base=primary), canonical, seqs


def test_primary_stores_half(graphs):
    wrap, canonical, seqs = graphs
    # canonical closure has (close to) twice the primary node count
    n_pal = 0  # odd k -> no palindromes in DNA
    assert canonical.num_nodes() == 2 * wrap.base.num_nodes() - n_pal
    assert wrap.num_nodes() == canonical.num_nodes()


def test_wrapper_maps_both_orientations(graphs):
    wrap, canonical, seqs = graphs
    s = seqs[0]
    fwd = wrap.map_to_nodes(s)
    assert (fwd > 0).all()
    rc = wrap.map_to_nodes(_revcomp(s))
    assert (rc > 0).all()
    # the rc windows are the same k-mer pairs, reversed order + offset flip
    N = wrap.base.num_nodes()
    base_fwd = np.where(fwd > N, fwd - N, fwd)
    base_rc = np.where(rc > N, rc - N, rc)
    np.testing.assert_array_equal(base_rc, base_fwd[::-1])
    # orientations are opposite
    assert ((fwd > N) == (rc[::-1] <= N)).all()


def test_wrapper_node_decode(graphs):
    wrap, canonical, seqs = graphs
    s = seqs[1]
    nodes = wrap.map_to_nodes(s)
    chars = wrap.node_kmers_chars(nodes)
    tbl = DNA.encode_table()
    cs = tbl[np.frombuffer(s, np.uint8)]
    for i in range(len(nodes)):
        np.testing.assert_array_equal(chars[i], cs[i:i + K])


def test_wrapper_adjacency_matches_canonical(graphs):
    wrap, canonical, seqs = graphs
    s = seqs[2]
    wn = wrap.map_to_nodes(s)
    # canonical-mode map_to_nodes canonicalizes; for an orientation-faithful
    # comparison resolve the raw window k-mers in the closure table directly
    import jax.numpy as jnp2
    from metagraph_tpu.kmer.extractor import encode_sequences
    codes = encode_sequences([s], canonical.alphabet)[:-1]
    from metagraph_tpu.kmer import packing as kp
    from metagraph_tpu.common import packed as pk
    idx = np.arange(len(codes) - K + 1)
    fields = [codes[idx + (K - 1)].astype(np.uint32)]
    for j in range(1, K):
        fields.append(codes[idx + (j - 1)].astype(np.uint32))
    lanes = pk.from_fields(jnp2.asarray(np.stack(fields)), 4)
    cn = np.asarray(canonical.edge_to_node(canonical.boss.map_to_edges(lanes)))
    ws = np.asarray(wrap.successors(jnp.asarray(wn)))
    cs = np.asarray(canonical.successors(jnp.asarray(cn)))
    # same pattern of existing successors per position and char...
    np.testing.assert_array_equal(ws > 0, cs > 0)
    wp = np.asarray(wrap.predecessors(jnp.asarray(wn)))
    cp = np.asarray(canonical.predecessors(jnp.asarray(cn)))
    np.testing.assert_array_equal(wp > 0, cp > 0)
    # ...and the successor k-mers decode identically
    for i in [0, 5, len(wn) - 1]:
        for c in range(4):
            if ws[i, c] > 0:
                np.testing.assert_array_equal(
                    wrap.node_kmers_chars(np.array([ws[i, c]]))[0],
                    canonical.node_kmers_chars(np.array([cs[i, c]]))[0])


def test_primary_annotation_query(graphs):
    wrap, canonical, seqs = graphs
    ann = annotate_sequences(
        wrap, [(s, [f"l{i}"]) for i, s in enumerate(seqs)]).finalize()
    adbg = AnnotatedDbg(graph=wrap, annotation=ann)
    for i, s in enumerate(seqs):
        assert f"l{i}" in adbg.get_labels(s, 1.0)
        # reverse complement queries hit the same rows
        assert f"l{i}" in adbg.get_labels(_revcomp(s), 1.0)


def test_primary_cli(tmp_path, capsys):
    from metagraph_tpu.cli.main import main
    rng = np.random.default_rng(5)
    seqs = [random_dna(rng, 120) for _ in range(2)]
    fa = str(tmp_path / "in.fa")
    with open(fa, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">s{i}\n{s.decode()}\n")
    g = str(tmp_path / "g")
    main(["build", "-k", "9", "--mode", "primary", "-o", g, fa])
    main(["stats", g])
    lines = capsys.readouterr().out.splitlines()
    assert lines[3] == "mode: primary"
    main(["annotate", "-i", g, "-o", str(tmp_path / "a"),
          "--anno-header", fa])
    qfa = str(tmp_path / "q.fa")
    with open(qfa, "w") as f:
        f.write(f">q\n{_revcomp(seqs[0][10:90]).decode()}\n")
    main(["query", "-i", g, "-a", str(tmp_path / "a.column.annodbg.npz"),
          "--discovery-fraction", "1.0", qfa])
    out = capsys.readouterr().out
    assert out.strip().split("\t") == ["0", "q", "s0"]
