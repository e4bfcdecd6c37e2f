"""HTTP server + Python client end-to-end test (reference test_api)."""

import socket

import numpy as np
import pytest

from conftest import random_dna
from metagraph_tpu.align.aligner import Aligner
from metagraph_tpu.engine.annotated_dbg import AnnotatedDbg, annotate_sequences
from metagraph_tpu.graph.boss_construct import build_boss
from metagraph_tpu.graph.dbg_succinct import DbgSuccinct
from metagraph_tpu.kmer.alphabets import DNA
from metagraph_tpu.server.http_server import serve
from metagraph_tpu.server.client import GraphClient, MultiGraphClient


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def server():
    rng = np.random.default_rng(3)
    seqs = [random_dna(rng, 200) for _ in range(3)]
    g = DbgSuccinct.from_boss(build_boss(seqs, 11), DNA, "basic")
    ann = annotate_sequences(
        g, [(s, [f"sample_{i}"]) for i, s in enumerate(seqs)]).finalize()
    adbg = AnnotatedDbg(graph=g, annotation=ann)
    port = free_port()
    httpd = serve(adbg, Aligner(g), port=port, background=True)
    yield port, seqs
    httpd.shutdown()


def test_ready_and_stats(server):
    port, seqs = server
    c = GraphClient("127.0.0.1", port)
    assert c.ready()
    st = c.stats()
    assert st["graph"]["k"] == 11
    assert st["annotation"]["labels"] == 3


def test_column_labels(server):
    port, seqs = server
    c = GraphClient("127.0.0.1", port)
    assert c.column_labels() == ["sample_0", "sample_1", "sample_2"]


def test_search(server):
    port, seqs = server
    c = GraphClient("127.0.0.1", port)
    recs = c.search(seqs[1][20:80].decode(), discovery_threshold=1.0)
    assert any(r["sample"] == "sample_1" for r in recs)
    assert all(r["seq_description"] == "0" for r in recs)


def test_align(server):
    port, seqs = server
    c = GraphClient("127.0.0.1", port)
    recs = c.align(seqs[0][30:90].decode())
    assert recs and recs[0]["cigar"] == "60="


def test_multi_client(server):
    port, seqs = server
    mc = MultiGraphClient()
    mc.add_graph("127.0.0.1", port, "g1")
    out = mc.search(seqs[0][:40].decode(), discovery_threshold=1.0)
    assert "g1" in out and any(r["sample"] == "sample_0" for r in out["g1"])


def test_query_client_mode(server, tmp_path, capsys):
    """`query --address host:port` round-trips through a live server."""
    port, seqs = server
    host = "127.0.0.1"
    from metagraph_tpu.cli.main import main
    qfa = str(tmp_path / "cq.fa")
    with open(qfa, "w") as f:
        s = seqs[0][10:90]
        f.write(f">hit\n{s.decode() if isinstance(s, bytes) else s}\n")
        f.write(">miss\n" + "A" * 50 + "\n")
    main(["query", "--address", f"{host}:{port}",
          "--discovery-fraction", "0.9", qfa])
    out = capsys.readouterr().out.splitlines()
    assert out[0].startswith("0\thit\t") and "sample" in out[0]
    assert out[1] == "1\tmiss\t"
