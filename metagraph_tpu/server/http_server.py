"""HTTP JSON query server.

Replaces the reference's asio Simple-Web-Server
(metagraph/src/cli/server.cpp:328-414) with a stdlib ThreadingHTTPServer:
endpoints POST /search, POST /align, GET /column_labels, GET /stats
with the reference's JSON shapes (server.cpp:46-121), so the Python
client (api/client.py) is wire-compatible with the reference's.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


class QueryService:
    """Shared immutable graph/annotation state + query logic."""

    def __init__(self, adbg, aligner=None):
        self.adbg = adbg
        self.aligner = aligner

    def search(self, payload: dict) -> list:
        """POST /search (reference process_search_request,
        server.cpp:126-193): count-label search, optionally aligning the
        reads first (``align``) and/or attaching per-k-mer presence
        signatures + BIGSI scores (``with_signature``)."""
        fasta = payload["FASTA"]
        discovery = float(payload.get("discovery_fraction", 0.7))
        num_labels = int(payload.get("num_labels", 2 ** 32))
        with_counts = bool(payload.get("abundance_sum", False))
        with_signature = bool(payload.get("with_signature", False))
        do_align = bool(payload.get("align", False))
        records = list(_parse_fasta_string(fasta))
        aligned = [None] * len(records)
        if do_align and self.aligner is not None:
            self.aligner.config.min_exact_match = float(
                payload.get("min_exact_match",
                            self.aligner.config.min_exact_match))
            seqs = [seq.encode() for _, seq in records]
            batches = self.aligner.align_batch(seqs)
            for i, res in enumerate(batches):
                if res:
                    aligned[i] = res[0]
                    records[i] = (records[i][0], res[0].sequence.decode())
        results = []
        if with_signature:
            for (name, seq), aln in zip(records, aligned):
                tops = self.adbg.get_top_label_signatures(
                    seq.encode(), num_labels, discovery)
                entry = {
                    "seq_description": name,
                    "results": [
                        {"sample": label,
                         "kmer_count": int(mask.sum()),
                         "signature": "".join(
                             "1" if b else "0" for b in mask)}
                        for label, mask in tops
                    ],
                }
                if aln is not None:
                    entry["sequence"] = seq
                    entry["score"] = int(aln.score)
                    entry["cigar"] = aln.cigar
                results.append(entry)
            return results
        from ..engine.annotated_dbg import BatchQuery
        tops_all = BatchQuery(self.adbg).get_top_labels_batch(
            [seq.encode() for _, seq in records], num_labels, discovery,
            with_kmer_counts=with_counts)
        for (name, seq), tops, aln in zip(records, tops_all, aligned):
            entry = {
                "seq_description": name,
                "results": [
                    {"sample": label, "kmer_count": int(count)}
                    for label, count in tops
                ],
            }
            if aln is not None:
                entry["sequence"] = seq
                entry["score"] = int(aln.score)
                entry["cigar"] = aln.cigar
            results.append(entry)
        return results

    def align(self, payload: dict) -> list:
        fasta = payload["FASTA"]
        records = list(_parse_fasta_string(fasta))
        if self.aligner is not None:
            batches = self.aligner.align_batch(
                [seq.encode() for _, seq in records],
                num_alternative_paths=int(
                    payload.get("max_alternative_alignments", 1)))
        else:
            batches = [[] for _ in records]
        return [{
            "seq_description": name,
            "alignments": [a.to_json(name) for a in alignments],
        } for (name, _seq), alignments in zip(records, batches)]

    def column_labels(self) -> list:
        return self.adbg.annotation.encoder.labels

    def stats(self) -> dict:
        g = self.adbg.graph
        return {
            "graph": {
                "k": g.k,
                "nodes": int(g.num_nodes()),
                "mode": g.mode,
            },
            "annotation": {
                "labels": self.adbg.num_labels,
                "objects": self.adbg.annotation.matrix.num_rows,
                "relations": self.adbg.annotation.matrix.nnz,
            },
        }


def _parse_fasta_string(s: str):
    name, chunks = None, []
    for line in s.splitlines():
        if line.startswith(">"):
            if name is not None:
                yield name, "".join(chunks)
            name, chunks = line[1:].strip(), []
        else:
            chunks.append(line.strip())
    if name is not None:
        yield name, "".join(chunks)


def make_handler(service: QueryService):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            try:
                if self.path == "/column_labels":
                    self._send(service.column_labels())
                elif self.path == "/stats":
                    self._send(service.stats())
                else:
                    self._send({"error": "not found"}, 404)
            except Exception as e:  # mirror reference: report, keep serving
                self._send({"error": str(e)}, 500)

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/search":
                    self._send(service.search(payload))
                elif self.path == "/align":
                    self._send(service.align(payload))
                else:
                    self._send({"error": "not found"}, 404)
            except Exception as e:
                self._send({"error": str(e)}, 500)

        def log_message(self, fmt, *args):  # route to stderr quietly
            pass

    return Handler


def serve(adbg, aligner=None, host="127.0.0.1", port=5555,
          background=False) -> Optional[ThreadingHTTPServer]:
    service = QueryService(adbg, aligner)
    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    if background:
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        return httpd
    httpd.serve_forever()
    return None


def run_server(args):
    from ..anno.annotator import Annotation
    from ..engine.annotated_dbg import AnnotatedDbg
    from ..graph import io as graph_io
    from ..align.aligner import Aligner

    g = graph_io.load_graph(args.infile_base)
    ann = Annotation.load(args.annotation)
    adbg = AnnotatedDbg(graph=g, annotation=ann)
    serve(adbg, Aligner(g), host=args.host, port=args.port)
