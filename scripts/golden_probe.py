"""Gap probe: run our CLI on the reference's integration-test configs and
compare against the oracle values checked into the reference's
integration_tests/*.py (the reference binary itself cannot be built here:
all vendored submodules are empty and there is no network egress).

Usage: JAX_PLATFORMS=cpu python scripts/golden_probe.py [group ...]
Groups: mt, t100, query, weighted, clean, assemble, kmc
"""

import io
import os
import sys
import contextlib
import tempfile

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

from metagraph_tpu.cli.main import main  # noqa: E402

DATA = "/root/reference/metagraph/tests/data"
TMP = tempfile.mkdtemp(prefix="golden_probe_")

PASS, FAIL = 0, 0
FAILURES = []


def run(argv):
    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            main(argv)
    except SystemExit as e:
        if e.code not in (0, None):
            raise RuntimeError(f"CLI exited {e.code}: {argv}")
    return buf.getvalue()


def check(name, got, want):
    global PASS, FAIL
    ok = got == want
    PASS += ok
    FAIL += not ok
    mark = "ok  " if ok else "FAIL"
    if not ok:
        FAILURES.append(f"{name}: got={got!r} want={want!r}")
    print(f"[{mark}] {name}: got={got!r} want={want!r}", flush=True)


def stats_fields(out):
    d = {}
    for line in out.splitlines():
        if ": " in line:
            k, v = line.split(": ", 1)
            d.setdefault(k, v.strip())
    return d


def grp_mt():
    # test_align.py:33-42,94-105,245-256
    for mode, nodes in [("basic", "16438"), ("canonical", "32782"),
                        ("primary", "16391")]:
        g = f"{TMP}/mt_{mode}"
        if mode == "primary":
            # base.py:62-90 — canonical build, extract primary kmers, rebuild
            run(["build", "-k", "11", "--mode", "canonical", "-o",
                 f"{TMP}/mt_can0", DATA + "/genome.MT.fa"])
            run(["transform", "-i", f"{TMP}/mt_can0", "--to-fasta",
                 "--primary-kmers", "-o", f"{TMP}/mt_primary_kmers"])
            run(["build", "-k", "11", "--mode", "primary", "-o", g,
                 f"{TMP}/mt_primary_kmers.fasta.gz"])
        else:
            run(["build", "-k", "11", "--mode", mode, "-o", g,
                 DATA + "/genome.MT.fa"])
        st = stats_fields(run(["stats", g]))
        check(f"mt {mode} nodes", st.get("nodes (k)"), nodes)
        check(f"mt {mode} mode", st.get("mode"), mode)

    # test_align.py:44-61 exact align TSV (basic graph)
    out = run(["align", "-i", f"{TMP}/mt_basic", "--align-min-exact-match",
               "0.0", DATA + "/genome_MT1.fq"])
    lines = out.rstrip().split("\n")
    check("align n lines", len(lines), 6)
    want = [
        'MT-10/1\tAACAGAGAATAGTTTAAATTAGAATCTTAGCTTTGGGTGCTAATGGTGGAGTTAAAGACTTTTTCTCTGATTTGTCCTTGGAAAAAGGTTTTCATCTCCGGTTTACAAGACTGGTGTATTAGTTTATACTACAAGGACAGGCCCATTTGA\t+\tTAGAATCTTAG\t22\t11\t19S11=120S\t0',
        'MT-8/1\tAAAACTAACCCCCTAATAAAATTAATTAACCACTCATTCATCGACCTCCCCACCCCATCCAACATCTCCGCATGATGAAACTTCGGCTCACTCCTTGGCGCCTGCCTGATCCTCCAAATCACCACAGGACTATTCCTAGCCATGCACTAC\t+\tAAAACTAACCCCCTAATAAAATTAATTAACCACTCATTCATCGACCTCCCCACCCCATCCAACATCTCCGCATGATGAAACTTCGGCTCACTCCTTGGCGCCTGCCTGATCCTCCAAATCACCACAGGACTATTCCTAGCCATGCACTAC\t300\t150\t150=\t0',
        'MT-6/1\tATATGACTAGCTTACACAATAGCTTTTATAGTAAAGATACCTCTTTACGGACTCCACTTATGACTCCCTAAAGCCCATGTCGAAGCCCCCATCGCTGGGTCAATAGTACTTGCCGCAGTACTCTTAAAACTAGGCGGCTATGGTATAATA\t+\tATATGACTAGCTTACACAATAGCTTTTATAGTAAAGATACCTCTTTACGGACTCCACTTATGACTCCCTAAAGCCCATGTCGAAGCCCCCATCGCTGGGTCAATAGTACTTGCCGCAGTACTCTTAAAACTAGGCGGCTATGGTATAATA\t300\t150\t150=\t0',
        'MT-4/1\tAGTATAGTAGTTCGCTTTGACTGGTGAAGTCTTAGCATGTACTGCTCGGAGGTTCGGTTCTGCTCCGAGGTCGCCCCAACCGAAATTTTTAATGCAGGTTTGGTAGTTTAGGACCTGTGGGTTTGTTAGGTACTGTTTGCATTAATAAAT\t*\t*\t0\t*\t*\t*',
        'MT-2/1\tTGTGTTAATTAATTAATGCTTGTAGGACATAATAATAACAATTGAATGTCTGCACAGCCACTTTCCACACAGACATCATAACAAAAAATTTCCACCAAACCCCCCCTCCCCCGCTTCTGGCCACAGCACTTAAACACATCTCTGCCAAAC\t+\tTGTGTTAATTAATTAATGCTTGTAGGACATAATAATAACAATTGAATGTCTGCACAGCCACTTTCCACACAGACATCATAACAAAAAATTTCCACCAAACCCCCCCTCCCCCGCTTCTGGCCACAGCACTTAAACACATCTCTGCCAAAC\t300\t150\t150=\t0',
    ]
    for i, w in enumerate(want):
        check(f"align line {i}", lines[i] if i < len(lines) else None, w)
    if len(lines) == 6:
        ls = lines[5].split("\t")
        check("align line5 name", ls[0], "MT-11/1")
        check("align line5 score", ls[4] if len(ls) > 4 else None, "22")

    # test_align.py:77-91 map --count-kmers
    out = run(["align", "-i", f"{TMP}/mt_basic", "--map", "--count-kmers",
               DATA + "/genome_MT1.fq"])
    lines = out.rstrip().split("\n")
    want_map = ['MT-10/1\t1/140/1', 'MT-8/1\t140/140/140',
                'MT-6/1\t140/140/140', 'MT-4/1\t0/140/0',
                'MT-2/1\t140/140/140', 'MT-11/1\t1/140/1']
    for i, w in enumerate(want_map):
        check(f"map line {i}", lines[i] if i < len(lines) else None, w)

    # canonical map (test_align.py:107-121)
    out = run(["align", "-i", f"{TMP}/mt_canonical", "--map",
               "--count-kmers", DATA + "/genome_MT1.fq"])
    lines = out.rstrip().split("\n")
    want_map = ['MT-10/1\t140/140/140', 'MT-8/1\t140/140/140',
                'MT-6/1\t140/140/140', 'MT-4/1\t129/140/129',
                'MT-2/1\t140/140/139', 'MT-11/1\t2/140/2']
    for i, w in enumerate(want_map):
        check(f"map canon line {i}", lines[i] if i < len(lines) else None, w)


def grp_t100():
    # test_query.py setUpClass + test_annotate.py
    for mode, nodes, dens in [("basic", "46960", "0.0185072"),
                              ("canonical", "91584", "0.00948888")]:
        g = f"{TMP}/t100_{mode}"
        run(["build", "-k", "20", "--mode", mode, "-o", g,
             DATA + "/transcripts_100.fa"])
        st = stats_fields(run(["stats", g]))
        check(f"t100 {mode} nodes", st.get("nodes (k)"), nodes)
        a = f"{TMP}/t100_{mode}_anno"
        run(["annotate", "-i", g, "-o", a, "--anno-header",
             DATA + "/transcripts_100.fa"])
        st = stats_fields(run(["stats", "-a", a + ".column.annodbg.npz",
                               a + ".column.annodbg.npz"]))
        check(f"t100 {mode} labels", st.get("labels"), "100")
        check(f"t100 {mode} objects", st.get("objects"), nodes)
        check(f"t100 {mode} density", st.get("density"), dens)

    # primary: 45792 nodes
    run(["transform", "-i", f"{TMP}/t100_canonical", "--to-fasta",
         "--primary-kmers", "-o", f"{TMP}/t100_pk"])
    run(["build", "-k", "20", "--mode", "primary", "-o",
         f"{TMP}/t100_primary", f"{TMP}/t100_pk.fasta.gz"])
    st = stats_fields(run(["stats", f"{TMP}/t100_primary"]))
    check("t100 primary nodes", st.get("nodes (k)"), "45792")


def grp_query():
    # byte-length oracles, test_query.py:140-159 (basic) :837-856 (canonical)
    g = f"{TMP}/t100_basic"
    a = f"{TMP}/t100_basic_anno.column.annodbg.npz"
    if not os.path.exists(a):
        grp_t100()
    out = run(["query", "-i", g, "-a", a, "--discovery-fraction", "1.0",
               DATA + "/transcripts_1000.fa"])
    check("query bytes", len(out.encode()), 137140)
    out = run(["query", "--count-labels", "-i", g, "-a", a,
               "--discovery-fraction", "1.0", DATA + "/transcripts_1000.fa"])
    check("query count-labels bytes", len(out.encode()), 136959)
    g = f"{TMP}/t100_canonical"
    a = f"{TMP}/t100_canonical_anno.column.annodbg.npz"
    out = run(["query", "-i", g, "-a", a, "--discovery-fraction", "1.0",
               DATA + "/transcripts_1000.fa"])
    check("query canon bytes", len(out.encode()), 137269)
    out = run(["query", "--count-labels", "-i", g, "-a", a,
               "--discovery-fraction", "1.0", DATA + "/transcripts_1000.fa"])
    check("query canon count-labels bytes", len(out.encode()), 137093)


def grp_weighted():
    # test_build_weighted.py
    g = f"{TMP}/t1000_w"
    run(["build", "-k", "20", "--count-kmers", "-o", g,
         DATA + "/transcripts_1000.fa"])
    st = stats_fields(run(["stats", g]))
    check("w basic nodes", st.get("nodes (k)"), "591997")
    check("w basic nnz", st.get("nnz weights"), "591997")
    check("w basic avg", st.get("avg weight"), "2.48587")
    g = f"{TMP}/t1000_wc"
    run(["build", "-k", "20", "--mode", "canonical", "--count-kmers",
         "-o", g, DATA + "/transcripts_1000.fa"])
    st = stats_fields(run(["stats", g]))
    check("w canon nodes", st.get("nodes (k)"), "1159851")
    check("w canon avg", st.get("avg weight"), "2.53761")
    # tiny k: count saturation at 255 (8-bit default width)
    g = f"{TMP}/t1000_k2"
    run(["build", "-k", "2", "--count-kmers", "-o", g,
         DATA + "/transcripts_1000.fa"])
    st = stats_fields(run(["stats", g]))
    check("w k2 nodes", st.get("nodes (k)"), "16")
    check("w k2 avg", st.get("avg weight"), "255")
    # count-width 2
    g = f"{TMP}/t1000_w2"
    run(["build", "-k", "20", "--count-kmers", "--count-width", "2",
         "-o", g, DATA + "/transcripts_1000.fa"])
    st = stats_fields(run(["stats", g]))
    check("w width2 avg", st.get("avg weight"), "1.73589")


def grp_clean():
    # test_clean.py: clean --to-fasta + rebuild
    g = f"{TMP}/t1000_cl"
    run(["build", "-k", "20", "--count-kmers", "-o", g,
         DATA + "/transcripts_1000.fa"])
    for name, extra, nodes, nnz, avg in [
        ("none", [], "591997", "591997", "2.48587"),
        ("tips", ["--prune-tips", "60"], "589774", "589774", "2.49001"),
        ("unitigs", ["--prune-unitigs", "3"], "167395", "167395", "5.52732"),
        ("both", ["--prune-tips", "60", "--prune-unitigs", "3"],
         "167224", "167224", "5.52757"),
    ]:
        fa = f"{TMP}/cl_{name}.fasta.gz"
        run(["clean", "-i", g, "--to-fasta", "-o", fa] + extra)
        g2 = f"{TMP}/t1000_cl_{name}"
        run(["build", "-k", "20", "--count-kmers", "-o", g2, fa])
        st = stats_fields(run(["stats", g2]))
        check(f"clean {name} nodes", st.get("nodes (k)"), nodes)
        check(f"clean {name} avg", st.get("avg weight"), avg)


def grp_assemble():
    # test_assemble.py gfa oracles
    g = f"{TMP}/t100_gfa"
    run(["build", "-k", "20", "--mode", "canonical", "-o", g,
         DATA + "/transcripts_100.fa"])
    run(["assemble", "-i", g, "-o", f"{TMP}/asm", "--unitigs", "--to-gfa",
         "--compacted"])
    with open(f"{TMP}/asm.gfa") as f:
        lines = f.read().rstrip("\n").split("\n")
    recs = {}
    for l in lines:
        recs[l[0]] = recs.get(l[0], 0) + 1
    check("gfa lines", len(lines), 2887)
    check("gfa S", recs.get("S"), 1252)
    check("gfa L", recs.get("L"), 1634)
    check("gfa H", recs.get("H"), 1)


def grp_kmc():
    g = f"{TMP}/kmc"
    run(["build", "-k", "11", "-o", g,
         DATA + "/transcripts_1000_kmc_counters.kmc_suf"])
    st = stats_fields(run(["stats", g]))
    check("kmc nodes", st.get("nodes (k)"), "469983")
    g = f"{TMP}/kmc_both"
    run(["build", "-k", "11", "-o", g,
         DATA + "/transcripts_1000_kmc_counters_both_strands.kmc_suf"])
    st = stats_fields(run(["stats", g]))
    check("kmc both nodes", st.get("nodes (k)"), "802920")
    # canonical builds (test_build.py:222-267: both 802920)
    g = f"{TMP}/kmc_can"
    run(["build", "--mode", "canonical", "-k", "11", "-o", g,
         DATA + "/transcripts_1000_kmc_counters.kmc_suf"])
    st = stats_fields(run(["stats", g]))
    check("kmc canonical nodes", st.get("nodes (k)"), "802920")
    check("kmc canonical mode", st.get("mode"), "canonical")
    g = f"{TMP}/kmc_both_can"
    run(["build", "--mode", "canonical", "-k", "11", "-o", g,
         DATA + "/transcripts_1000_kmc_counters_both_strands.kmc_suf"])
    st = stats_fields(run(["stats", g]))
    check("kmc both canonical nodes", st.get("nodes (k)"), "802920")
    # chunked build from KMC + concatenate (test_build.py:270-330)
    g = f"{TMP}/kmc_chunks"
    for sfx in ["$", "A", "C", "G", "T"]:
        run(["build", "-k", "11", "--suffix", sfx, "-o", g,
             DATA + "/transcripts_1000_kmc_counters.kmc_suf"])
    run(["concatenate", "--len-suffix", "1", "-i", g,
         "-o", f"{TMP}/kmc_cat"])
    st = stats_fields(run(["stats", f"{TMP}/kmc_cat"]))
    check("kmc chunked nodes", st.get("nodes (k)"), "469983")
    # canonical chunked (test_build.py:310-330)
    g = f"{TMP}/kmc_chunks_can"
    for sfx in ["$", "A", "C", "G", "T"]:
        run(["build", "-k", "11", "--mode", "canonical", "--suffix", sfx,
             "-o", g, DATA + "/transcripts_1000_kmc_counters.kmc_suf"])
    run(["concatenate", "--len-suffix", "1", "--mode", "canonical",
         "-i", g, "-o", f"{TMP}/kmc_cat_can"])
    st = stats_fields(run(["stats", f"{TMP}/kmc_cat_can"]))
    check("kmc chunked canonical nodes", st.get("nodes (k)"), "802920")
    # weighted from KMC
    g = f"{TMP}/kmc_w"
    run(["build", "-k", "11", "--count-kmers", "-o", g,
         DATA + "/transcripts_1000_kmc_counters.kmc_suf"])
    st = stats_fields(run(["stats", g]))
    check("kmc w avg", st.get("avg weight"), "3.15029")


GROUPS = {"mt": grp_mt, "t100": grp_t100, "query": grp_query,
          "weighted": grp_weighted, "clean": grp_clean,
          "assemble": grp_assemble, "kmc": grp_kmc}

if __name__ == "__main__":
    names = sys.argv[1:] or list(GROUPS)
    for n in names:
        print(f"=== group {n} ===", flush=True)
        try:
            GROUPS[n]()
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(f"[ERR ] group {n}: {e}", flush=True)
            FAIL += 1
    print(f"\n{PASS} ok, {FAIL} fail  (workdir {TMP})")
