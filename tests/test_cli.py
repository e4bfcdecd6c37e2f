"""Integration tests driving the CLI in-process (mirrors the reference's
integration_tests/ approach of asserting on stats/query stdout)."""

import gzip
import os

import numpy as np
import pytest

from conftest import REFERENCE_DATA, random_dna
from metagraph_tpu.cli.main import main


def read_fasta_gz(path):
    out, cur = [], []
    with gzip.open(path, "rb") as f:
        for line in f.read().decode().splitlines():
            if line.startswith(">"):
                if cur:
                    out.append("".join(cur))
                cur = []
            else:
                cur.append(line)
    if cur:
        out.append("".join(cur))
    return out


def write_fasta(path, seqs, names=None):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            name = names[i] if names else f"seq{i}"
            f.write(f">{name}\n{s.decode() if isinstance(s, bytes) else s}\n")


@pytest.fixture
def workdir(tmp_path, rng):
    seqs = [random_dna(rng, 150) for _ in range(4)]
    fa = str(tmp_path / "input.fa")
    write_fasta(fa, seqs)
    return tmp_path, fa, seqs


def test_build_stats(workdir, capsys):
    tmp, fa, seqs = workdir
    out = str(tmp / "graph")
    main(["build", "-k", "11", "-o", out, fa])
    main(["stats", out])
    captured = capsys.readouterr().out
    lines = captured.splitlines()
    assert lines[0].startswith("================")
    assert lines[1] == "k: 11"
    nodes = int(lines[2].split(": ")[1])
    gold = set()
    for s in seqs:
        for i in range(len(s) - 11 + 1):
            gold.add(s[i:i + 11])
    assert nodes == len(gold)
    assert lines[3] == "mode: basic"
    assert any(l.startswith("W stats:") for l in lines)
    assert any(l.startswith("F stats:") for l in lines)


def test_build_canonical_stats(workdir, capsys):
    tmp, fa, seqs = workdir
    out = str(tmp / "graph")
    main(["build", "-k", "11", "--mode", "canonical", "-o", out, fa])
    main(["stats", out])
    lines = capsys.readouterr().out.splitlines()
    assert lines[3] == "mode: canonical"


def test_annotate_query(workdir, capsys):
    tmp, fa, seqs = workdir
    out = str(tmp / "graph")
    main(["build", "-k", "11", "-o", out, fa])
    # per-sequence labels via separate files
    fas = []
    for i, s in enumerate(seqs[:2]):
        p = str(tmp / f"part{i}.fa")
        write_fasta(p, [s])
        fas.append(p)
    main(["annotate", "-i", out, "-o", str(tmp / "anno"),
          "--anno-filename"] + fas)
    anno = str(tmp / "anno.column.annodbg.npz")
    assert os.path.exists(anno)
    qfa = str(tmp / "q.fa")
    write_fasta(qfa, [seqs[0][20:80], seqs[1][10:50], b"GGGG" + bytes(60 * b"A")],
                names=["a", "b", "c"])
    main(["query", "-i", out, "-a", anno, "--discovery-fraction", "1.0", qfa])
    out_lines = capsys.readouterr().out.splitlines()
    assert out_lines[0].split("\t") == ["0", "a", fas[0]]
    assert out_lines[1].split("\t") == ["1", "b", fas[1]]
    assert out_lines[2].split("\t") == ["2", "c", ""]


def test_query_counts(workdir, capsys):
    tmp, fa, seqs = workdir
    out = str(tmp / "graph")
    main(["build", "-k", "11", "-o", out, fa])
    main(["annotate", "-i", out, "-o", str(tmp / "anno"),
          "--anno-label", "all", fa])
    anno = str(tmp / "anno.column.annodbg.npz")
    qfa = str(tmp / "q.fa")
    q = seqs[0][:40]
    write_fasta(qfa, [q], names=["r0"])
    main(["query", "-i", out, "-a", anno, "--count-labels",
          "--discovery-fraction", "0.0", qfa])
    line = capsys.readouterr().out.strip()
    assert line == f"0\tr0\t<all>:{len(q) - 11 + 1}"


def test_assemble_unitigs_roundtrip(workdir, capsys):
    tmp, fa, seqs = workdir
    out = str(tmp / "graph")
    main(["build", "-k", "11", "-o", out, fa])
    main(["assemble", "-i", out, "-o", str(tmp / "contigs"), "--unitigs"])
    unitigs = read_fasta_gz(str(tmp / "contigs.fasta.gz"))
    # the unitig k-mer multiset equals the graph's node set
    gold = set()
    for s in seqs:
        for i in range(len(s) - 11 + 1):
            gold.add(s[i:i + 11].decode() if isinstance(s, bytes) else s[i:i+11])
    got = set()
    for u in unitigs:
        for i in range(len(u) - 11 + 1):
            got.add(u[i:i + 11])
    assert got == gold


def test_compare(workdir, capsys):
    tmp, fa, seqs = workdir
    main(["build", "-k", "11", "-o", str(tmp / "g1"), fa])
    main(["build", "-k", "11", "-o", str(tmp / "g2"), fa])
    main(["compare", str(tmp / "g1"), str(tmp / "g2")])
    assert "identical" in capsys.readouterr().out


def test_sharded_build_equals_plain(workdir, capsys):
    tmp, fa, seqs = workdir
    main(["build", "-k", "11", "-o", str(tmp / "plain"), fa])
    main(["build", "-k", "11", "--suffix-len", "2", "-o",
          str(tmp / "sharded"), fa])
    main(["compare", str(tmp / "plain"), str(tmp / "sharded")])
    assert "Graphs are identical" in capsys.readouterr().out


def test_weighted_build_and_clean(workdir, capsys, rng):
    tmp, fa, seqs = workdir
    # duplicate a sequence many times to create high-coverage k-mers
    deep = [seqs[0]] * 10 + [random_dna(rng, 80)]
    fa2 = str(tmp / "deep.fa")
    write_fasta(fa2, deep)
    out = str(tmp / "wg")
    main(["build", "-k", "11", "--count-kmers", "-o", out, fa2])
    main(["clean", "-i", out, "-o", str(tmp / "cleaned"),
          "--min-count", "5", "--unitigs"])
    unitigs = read_fasta_gz(str(tmp / "cleaned.fasta.gz"))
    # only the deep sequence's k-mers survive
    deep_kmers = {seqs[0][i:i + 11] for i in range(len(seqs[0]) - 10)}
    for u in unitigs:
        for i in range(len(u) - 10):
            assert u[i:i + 11].encode() in deep_kmers


def test_transform_to_gfa(workdir, capsys):
    tmp, fa, seqs = workdir
    out = str(tmp / "graph")
    main(["build", "-k", "11", "-o", out, fa])
    main(["transform", "-i", out, "-o", str(tmp / "g"), "--to-gfa"])
    text = open(str(tmp / "g.gfa")).read()
    assert text.startswith("H\t")
    assert "S\t1\t" in text


def test_build_from_kmc(capsys, tmp_path):
    """Reference oracle: KMC db of transcripts_1000, k=11 -> 469983 nodes
    (integration test_build.py:194-195)."""
    kmc = REFERENCE_DATA + "/transcripts_1000_kmc_counters.kmc_suf"
    out = str(tmp_path / "kmcg")
    main(["build", "-k", "11", "-o", out, kmc])
    main(["stats", out])
    lines = capsys.readouterr().out.splitlines()
    assert lines[1] == "k: 11"
    assert lines[2] == "nodes (k): 469983"


def test_build_from_kmc_both_strands(capsys, tmp_path):
    """Oracle: both-strands KMC db -> 802920 nodes (test_build.py:216)."""
    kmc = REFERENCE_DATA + "/transcripts_1000_kmc_counters_both_strands.kmc_suf"
    out = str(tmp_path / "kmcg2")
    main(["build", "-k", "11", "-o", out, kmc])
    main(["stats", out])
    lines = capsys.readouterr().out.splitlines()
    assert lines[2] == "nodes (k): 802920"


def test_extend(workdir, capsys, rng):
    tmp, fa, seqs = workdir
    extra = [random_dna(rng, 100)]
    fa2 = str(tmp / "extra.fa")
    write_fasta(fa2, extra)
    g1 = str(tmp / "base")
    main(["build", "-k", "11", "-o", g1, fa])
    main(["extend", "-i", g1, "-o", str(tmp / "ext"), fa2])
    # extended graph equals a fresh build over both inputs
    both = str(tmp / "both")
    faboth = str(tmp / "both.fa")
    write_fasta(faboth, seqs + extra)
    main(["build", "-k", "11", "-o", both, faboth])
    main(["compare", str(tmp / "ext"), both])
    assert "Graphs are identical" in capsys.readouterr().out


def test_coordinates_annotation_query(workdir, capsys):
    tmp, fa, seqs = workdir
    g = str(tmp / "cg")
    main(["build", "-k", "11", "-o", g, fa])
    main(["annotate", "-i", g, "-o", str(tmp / "ca"), "--coordinates",
          "--anno-header", fa])
    anno = str(tmp / "ca.coord.annodbg.npz")
    assert os.path.exists(anno)
    qfa = str(tmp / "cq.fa")
    frag = seqs[0][30:70]
    write_fasta(qfa, [frag], names=["r"])
    main(["query", "-i", g, "-a", anno, "--query-coords",
          "--discovery-fraction", "1.0", qfa])
    line = capsys.readouterr().out.strip()
    fields = line.split("\t")
    assert fields[:2] == ["0", "r"]
    assert fields[2].startswith("<seq0>")
    groups = fields[2].split(":")[1:]
    # one coordinate tuple per window; coordinates are consecutive from 30
    assert len(groups) == len(frag) - 11 + 1
    assert groups[0] == "30" and groups[1] == "31"


def test_align_cli_and_json(workdir, capsys):
    tmp, fa, seqs = workdir
    out = str(tmp / "ag")
    main(["build", "-k", "11", "-o", out, fa])
    qfa = str(tmp / "reads.fa")
    write_fasta(qfa, [seqs[0][20:90]], names=["r0"])
    main(["align", "-i", out, qfa])
    # reference TSV contract (aligner_alignment.hpp:180):
    # name, query, orientation, sequence, score, matches, cigar, offset
    line = capsys.readouterr().out.strip().split("\t")
    assert line[0] == "r0"
    assert line[2] == "+"
    assert line[4] == str(2 * 70) and line[6] == "70="
    main(["align", "-i", out, "--json", qfa])
    import json as _json
    rec = _json.loads(capsys.readouterr().out.strip())
    assert rec["score"] == 140 and rec["cigar"] == "70="
    # map with counts (align.cpp:212-226 format)
    main(["align", "-i", out, "--map", "--count-kmers", qfa])
    assert capsys.readouterr().out.strip() == "r0\t60/60/60"


def test_build_dna5(workdir, capsys, tmp_path):
    tmp, fa, seqs = workdir
    fa5 = str(tmp / "n5.fa")
    write_fasta(fa5, [b"ACGTNNACGTACGTN" + seqs[0]])
    out = str(tmp / "g5")
    main(["build", "-k", "5", "--alphabet", "DNA5", "-o", out, fa5])
    main(["stats", out])
    lines = capsys.readouterr().out.splitlines()
    nodes = int(lines[2].split(": ")[1])
    # with DNA5 the N-containing 5-mers are real nodes
    gold = set()
    s = b"ACGTNNACGTACGTN" + seqs[0]
    for i in range(len(s) - 4):
        gold.add(s[i:i + 5])
    assert nodes == len(gold)


def test_disk_swap_build(workdir, capsys, tmp_path):
    tmp, fa, seqs = workdir
    main(["build", "-k", "11", "--disk-swap", str(tmp_path), "-o",
          str(tmp / "sw"), fa])
    main(["build", "-k", "11", "-o", str(tmp / "pl"), fa])
    main(["compare", str(tmp / "sw"), str(tmp / "pl")])
    assert "Graphs are identical" in capsys.readouterr().out


def test_query_align_mode(workdir, capsys, rng):
    tmp, fa, seqs = workdir
    g = str(tmp / "qa")
    main(["build", "-k", "11", "-o", g, fa])
    main(["annotate", "-i", g, "-o", str(tmp / "qaa"), "--anno-header", fa])
    # read with one mismatch: plain query at 1.0 fails, --align recovers
    read = bytearray(seqs[1][20:90])
    sub = {65: 67, 67: 65, 71: 84, 84: 71}
    read[30] = sub[read[30]]
    qfa = str(tmp / "qa.fa")
    write_fasta(qfa, [bytes(read)], names=["m"])
    anno = str(tmp / "qaa.column.annodbg.npz")
    main(["query", "-i", g, "-a", anno, "--discovery-fraction", "1.0", qfa])
    plain_out = capsys.readouterr().out.rstrip("\n")
    assert plain_out.split("\t")[2:] == [""]  # no labels at full threshold
    main(["query", "-i", g, "-a", anno, "--align",
          "--discovery-fraction", "1.0", qfa])
    align_out = capsys.readouterr().out.strip()
    assert align_out.split("\t")[2] == "seq1"


def test_transform_adj_list(workdir, capsys, tmp_path):
    tmp, fa, seqs = workdir
    g = str(tmp / "adj")
    main(["build", "-k", "11", "-o", g, fa])
    main(["transform", "-i", g, "-o", str(tmp / "al"), "--to-adj-list"])
    lines = open(str(tmp / "al.adjlist")).read().splitlines()
    assert len(lines) > 100
    # spot-check: listed successors are consistent with the graph
    import jax.numpy as jnp
    from metagraph_tpu.graph import io as graph_io
    gg = graph_io.load_graph(g)
    node, _, targets = lines[5].partition("\t")
    succ = np.asarray(gg.successors(jnp.asarray(np.array([int(node)]))))[0]
    assert sorted(int(t) for t in targets.split() if t) == \
        sorted(int(t) for t in succ if t > 0)


def test_merge_weighted(tmp_path, rng):
    """merge sums per-k-mer counts of weighted inputs (the reference's
    merge accumulates weights) and unions the k-mer sets."""
    from metagraph_tpu.graph.io import load_graph
    s1 = random_dna(rng, 120)
    s2 = random_dna(rng, 120)
    fa1, fa2 = str(tmp_path / "a.fa"), str(tmp_path / "b.fa")
    write_fasta(fa1, [s1, s1])       # every k-mer count 2 (at least)
    write_fasta(fa2, [s2])
    g1, g2, gm = (str(tmp_path / n) for n in ("g1", "g2", "gm"))
    main(["build", "-k", "11", "--count-kmers", "-o", g1, fa1])
    main(["build", "-k", "11", "--count-kmers", "-o", g2, fa2])
    main(["merge", "-o", gm, g1, g2])
    a, b, m = load_graph(g1), load_graph(g2), load_graph(gm)
    assert m.boss.weights is not None
    # union of node sets
    def kmers(s, k=11):
        return {s[i:i + k] for i in range(len(s) - k + 1)}
    assert m.num_nodes() == len(kmers(s1) | kmers(s2))
    # a k-mer present in only the doubled input keeps count 2; one present
    # in both inputs sums
    wa = np.asarray(a.boss.weights)
    wm = np.asarray(m.boss.weights)
    assert int(wa.max()) >= 2 and int(wm.max()) >= int(wa.max())
    total_a = int(np.asarray(a.boss.weights).sum())
    total_b = int(np.asarray(b.boss.weights).sum())
    assert int(wm.sum()) == total_a + total_b


def test_align_query_presence(workdir, capsys):
    tmp, fa, seqs = workdir
    g = str(tmp / "qp")
    main(["build", "-k", "11", "-o", g, fa])
    qfa = str(tmp / "qp.fa")
    write_fasta(qfa, [seqs[0][10:80], b"A" * 40], names=["hit", "miss"])
    main(["align", "-i", g, "--query-presence",
          "--discovery-fraction", "0.9", qfa])
    out = capsys.readouterr().out.strip().splitlines()
    assert out == ["1", "0"]
    main(["align", "-i", g, "--query-presence", "--filter-present", qfa])
    out = capsys.readouterr().out
    assert ">hit" in out and ">miss" not in out


def test_build_parts_concatenate(workdir, capsys, tmp_path):
    """--parts-total/--part-idx chunked build + concatenate equals the
    direct build (reference build.cpp part workflow)."""
    from metagraph_tpu.graph.io import load_graph
    tmp, fa, seqs = workdir
    direct = str(tmp / "direct")
    main(["build", "-k", "11", "-o", direct, fa])
    base = str(tmp / "parts")
    for p in range(2):
        main(["build", "-k", "11", "--suffix-len", "1",
              "--parts-total", "2", "--part-idx", str(p), "-o", base, fa])
    outb = str(tmp / "joined")
    main(["concatenate", "-i", base, "--len-suffix", "1", "-o", outb])
    a, b = load_graph(direct), load_graph(outb)
    assert a.num_nodes() == b.num_nodes()
    np.testing.assert_array_equal(np.asarray(a.boss.W),
                                  np.asarray(b.boss.W))


def test_transform_anno_rename_and_dump(workdir, capsys, tmp_path):
    tmp, fa, seqs = workdir
    g = str(tmp / "rg")
    main(["build", "-k", "11", "-o", g, fa])
    a = str(tmp / "ra")
    main(["annotate", "-i", g, "-o", a, "--anno-header", fa])
    col = a + ".column.annodbg.npz"
    rules = str(tmp / "rules.txt")
    open(rules, "w").write("seq0 renamed_zero\n")
    out = str(tmp / "renamed")
    main(["transform_anno", "--anno-type", "column", "-o", out,
          "--rename-cols", rules, col])
    from metagraph_tpu.anno.annotator import Annotation
    ren = Annotation.load(out + ".column.annodbg.npz")
    assert "renamed_zero" in ren.encoder.labels
    assert "seq0" not in ren.encoder.labels
    # text dump: one file per column, row ids sorted
    main(["transform_anno", "-o", str(tmp / "dump"),
          "--dump-text-anno", col])
    f0 = str(tmp / "dump") + ".0.text.annodbg"
    lines = open(f0).read().splitlines()
    assert int(lines[0]) == len(lines) - 1
    ids = [int(x) for x in lines[1:]]
    assert ids == sorted(ids) and len(ids) > 0


def test_clean_count_slices(workdir, tmp_path, capsys):
    """--count-slice-quantiles bins cleaned contigs by k-mer abundance
    into one fasta per quantile pair; slices partition the node set."""
    tmp, fa, seqs = workdir
    fa2 = str(tmp / "dup.fa")
    # duplicate one sequence so counts vary (1 and 2)
    write_fasta(fa2, [seqs[0], seqs[0], seqs[1]])
    g = str(tmp / "cs")
    main(["build", "-k", "11", "--count-kmers", "-o", g, fa2])
    out = str(tmp / "sl")
    main(["clean", "-i", g, "-o", out,
          "--count-slice-quantiles", "0 0.5 1"])
    import gzip
    def kmers_of(path):
        ks = set()
        with gzip.open(path, "rb") as f:
            cur = []
            for line in f.read().decode().splitlines():
                if line.startswith(">"):
                    if cur:
                        s = "".join(cur)
                        ks.update(s[i:i+11] for i in range(len(s)-10))
                    cur = []
                else:
                    cur.append(line)
            if cur:
                s = "".join(cur)
                ks.update(s[i:i+11] for i in range(len(s)-10))
        return ks
    a = kmers_of(out + ".0.0.5.fasta.gz")
    b = kmers_of(out + ".0.5.1.fasta.gz")
    gold = set()
    for s in (seqs[0], seqs[1]):
        ss = s.decode()
        gold.update(ss[i:i+11] for i in range(len(ss)-10))
    assert a | b == gold
    assert not (a & b)


def test_annotate_header_delimiter(workdir, capsys, tmp_path):
    tmp, fa, seqs = workdir
    fa2 = str(tmp / "hd.fa")
    write_fasta(fa2, seqs[:2], names=["sampleA|tissue1", "sampleB|tissue2"])
    g = str(tmp / "hd")
    main(["build", "-k", "11", "-o", g, fa2])
    a = str(tmp / "hda")
    main(["annotate", "-i", g, "-o", a, "--anno-header",
          "--header-delimiter", "|", fa2])
    from metagraph_tpu.anno.annotator import Annotation
    ann = Annotation.load(a + ".column.annodbg.npz")
    assert set(ann.encoder.labels) == {"sampleA", "tissue1",
                                       "sampleB", "tissue2"}


def test_stats_validate(workdir, capsys):
    tmp, fa, seqs = workdir
    g = str(tmp / "val")
    main(["build", "-k", "11", "-o", g, fa])
    main(["stats", "--validate", g])
    out = capsys.readouterr().out
    assert "validation: OK" in out


def test_protein_build_query(tmp_path, rng, capsys):
    """Protein-alphabet graphs build and answer queries (the reference
    ships a protein binary; here one flag switches the alphabet)."""
    letters = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", np.uint8)
    seqs = [bytes(rng.choice(letters, 60)) for _ in range(3)]
    fa = str(tmp_path / "prot.fa")
    write_fasta(fa, seqs)
    g = str(tmp_path / "pg")
    main(["build", "--alphabet", "Protein", "-k", "7", "-o", g, fa])
    main(["stats", g])
    out = capsys.readouterr().out
    nodes = int([l for l in out.splitlines()
                 if l.startswith("nodes (k):")][0].split(": ")[1])
    gold = {seqs[i][j:j + 7] for i in range(3)
            for j in range(len(seqs[i]) - 6)}
    assert nodes == len(gold)
    a = str(tmp_path / "pa")
    main(["annotate", "-i", g, "-o", a, "--anno-header", fa])
    qfa = str(tmp_path / "pq.fa")
    write_fasta(qfa, [seqs[2][10:40]], names=["hit"])
    main(["query", "-i", g, "-a", a + ".column.annodbg.npz",
          "--discovery-fraction", "0.9", qfa])
    out = capsys.readouterr().out
    assert "seq2" in out


def test_row_diff_staged_pipeline_matches_one_pass(workdir, capsys):
    """Reference-shaped 3-invocation row-diff pipeline (stages 0 -> 1 ->
    2, row_diff_builder.cpp:100-540): the .row_count/.row_reduction
    artifacts are real, and the staged result is identical to the
    one-pass stage-2 conversion."""
    tmp, fa, seqs = workdir
    out = str(tmp / "g")
    main(["build", "-k", "11", "-o", out, fa])
    main(["annotate", "-i", out, "-o", str(tmp / "a"), "--anno-header", fa])
    col = str(tmp / "a.column.annodbg.npz")

    # one-pass (no artifacts on disk)
    main(["transform_anno", "--anno-type", "row_diff", "-i", out,
          "-o", str(tmp / "solo"), col])
    # staged: stage 0 writes .row_count, stage 1 .row_reduction, stage 2
    # consumes both
    main(["transform_anno", "--anno-type", "row_diff", "-i", out,
          "--row-diff-stage", "0", "-o", str(tmp / "st"), col])
    assert (tmp / "st.row_count.npz").exists()
    main(["transform_anno", "--anno-type", "row_diff", "-i", out,
          "--row-diff-stage", "1", "-o", str(tmp / "st"), col])
    assert (tmp / "st.row_reduction.npz").exists()
    main(["transform_anno", "--anno-type", "row_diff", "-i", out,
          "--row-diff-stage", "2", "-o", str(tmp / "st"), col])

    a = np.load(str(tmp / "solo.row_diff.annodbg.npz"))
    b = np.load(str(tmp / "st.row_diff.annodbg.npz"))
    assert sorted(a.files) == sorted(b.files)
    for k in a.files:
        assert np.array_equal(a[k], b[k]), k

    # artifacts hold real data: counts sum to nnz, and a second stage-0
    # invocation accumulates (the reference's column-batch behavior)
    rc1 = np.load(str(tmp / "st.row_count.npz"))["row_count"]
    ann = np.load(col)
    main(["transform_anno", "--anno-type", "row_diff", "-i", out,
          "--row-diff-stage", "0", "-o", str(tmp / "st"), col])
    rc2 = np.load(str(tmp / "st.row_count.npz"))["row_count"]
    assert rc1.sum() > 0
    assert rc2.sum() == 2 * rc1.sum()


def test_all_anno_types_save_load_query(workdir, capsys):
    """Contract: every named --anno-type converts, serializes, reloads,
    and answers the same label query (static_annotators_def.hpp:26-58
    format matrix)."""
    tmp, fa, seqs = workdir
    out = str(tmp / "g")
    main(["build", "-k", "11", "-o", out, fa])
    main(["annotate", "-i", out, "-o", str(tmp / "a"), "--anno-header",
          "--count-kmers", fa])
    col = str(tmp / "a.column.annodbg.npz")
    main(["annotate", "-i", out, "-o", str(tmp / "ac"), "--anno-header",
          "--coordinates", fa])
    coord_col = str(tmp / "ac.coord.annodbg.npz")
    qfa = str(tmp / "q.fa")
    with open(qfa, "w") as f:
        f.write(f">q\n{seqs[1][20:120].decode()}\n")

    main(["query", "-i", out, "-a", col, "--discovery-fraction", "0.9", qfa])
    expect = capsys.readouterr().out
    assert "seq1" in expect

    binary_like = ["column", "row", "row_sparse", "flat", "brwt",
                   "bin_rel_wt", "bin_rel_wt_sdsl", "unique_row", "rbfish",
                   "rb_brwt", "row_diff", "row_diff_sparse",
                   "row_diff_brwt", "int_row_diff", "int_brwt",
                   "row_diff_int_brwt", "int_row_diff_brwt"]
    needs_graph = {"row_diff", "row_diff_sparse", "row_diff_brwt",
                   "int_row_diff", "row_diff_int_brwt",
                   "int_row_diff_brwt"}
    for t in binary_like:
        dst = str(tmp / f"t_{t}")
        cmd = ["transform_anno", "--anno-type", t, "-o", dst, col]
        if t in needs_graph:
            cmd[3:3] = ["-i", out]
        main(cmd)
        outs = [p for p in tmp.iterdir()
                if p.name.startswith(f"t_{t}.") and
                p.name.endswith(".annodbg.npz")]
        assert outs, t
        main(["query", "-i", out, "-a", str(outs[0]),
              "--discovery-fraction", "0.9", qfa])
        got = capsys.readouterr().out
        assert got == expect, t

    # coordinate formats keep their own query surface
    for t in ["column_coord", "row_diff_coord", "tuple_row_diff"]:
        dst = str(tmp / f"t_{t}")
        cmd = ["transform_anno", "--anno-type", t, "-i", out, "-o", dst,
               coord_col]
        main(cmd)
        outs = [p for p in tmp.iterdir()
                if p.name.startswith(f"t_{t}.") and
                p.name.endswith(".annodbg.npz")]
        assert outs, t
        main(["query", "-i", out, "-a", str(outs[0]), "--query-coords",
              "--discovery-fraction", "0.9", qfa])
        got = capsys.readouterr().out
        assert "seq1" in got, t


def test_reference_quickstart_invocations(workdir, capsys, monkeypatch):
    """The reference's documented quick-start command lines run
    unmodified (quick_start.rst:40-135): full flag surface parity."""
    tmp, fa, seqs = workdir
    out = str(tmp / "graph")
    # quick_start.rst:40 (long flags) and :45 (short flags)
    main(["build", "--verbose", "--parallel", "4", "-k", "31",
          "--outfile-base", out, fa])
    main(["build", "-v", "-p", "4", "-k", "31", "-o", out, fa])
    # :91 disk-swap build with --disk-cap-gb (accepted, warned)
    main(["build", "-v", "-k", "31", "-o", out + "_ds", "-p", "36",
          "--disk-swap", str(tmp), "--disk-cap-gb", "4", fa])
    # :100 small-state transform, :104 to-fasta transform
    main(["transform", "-v", "--state", "small", "-p", "4",
          "-o", out + "_small", out])
    main(["transform", "-v", "--to-fasta", "-o", str(tmp / "contigs"),
          "-p", "4", out])
    # :53 stdin file list
    import io
    monkeypatch.setattr("sys.stdin", io.StringIO(fa + "\n"))
    main(["build", "-v", "-p", "4", "-k", "31", "-o", out + "_stdin"])
    capsys.readouterr()
    main(["stats", out + "_stdin"])
    cap = capsys.readouterr().out
    n1 = [l for l in cap.splitlines() if l.startswith("nodes (k):")]
    capsys.readouterr()
    main(["stats", out])
    cap2 = capsys.readouterr().out
    n2 = [l for l in cap2.splitlines() if l.startswith("nodes (k):")]
    assert n1 == n2 and n1
