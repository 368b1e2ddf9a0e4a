"""SketchServer / TaxServer — HTTP services over heavy indexes.

Reference: the reference hosts its large indexes behind
`com.sun.net.httpserver`-based services — tax/TaxServer.java:58
(createContext :351-355; also serves sketches in `sketchonly` mode
wrapping sketch/SketchSearcher), with clients tax/TaxClient and
sketch/SendSketch posting queries to the public endpoints listed in
shared/Shared.java:86-106 (SURVEY.md §2 "client/server distribution").

Here: one stdlib ThreadingHTTPServer hosting both roles —
  GET  /tax/<name-or-taxid>          -> lineage json
  GET  /tax/ancestor/<a>/<b>         -> common-ancestor json
  POST /sketch/compare               -> body: json {hashes:[...], k}
                                        -> top matches vs loaded refs
  GET  /health                       -> {"status": "ok"}

The heavy state (TaxTree, reference sketches) loads once at startup;
request handling is read-only and thread-safe. `send_sketch()` is the
SendSketch client analog.
"""

from __future__ import annotations

import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..core.parser import tokenize


class ServerState:
    def __init__(self):
        self.tree = None
        self.sketches = []  # (name, hashes, k)
        self.clades = []  # Clade profiles (QuickClade DB role)

    def add_clade_fasta(self, path: str):
        if path.endswith(".npz"):  # cladeloader DB
            from .clade import load_db

            self.clades.extend(load_db(path))
            return
        from .clade import profile_fasta

        self.clades.append(profile_fasta(path))

    def load_tax(self, names_dmp: str, nodes_dmp: str):
        from .taxonomy import TaxTree

        self.tree = TaxTree.load(names_dmp, nodes_dmp)

    def add_sketch_file(self, path: str):
        from .sketch import read_sketch

        hashes, k = read_sketch(path)
        self.sketches.append((path, hashes, k))

    def add_reference_fasta(self, path: str, k: int = 31, size: int = 10000):
        from .sketch import sketch_file

        hashes = sketch_file(path, k=k, size=size)
        self.sketches.append((path, hashes, k))


def _make_handler(state: ServerState):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            parts = [p for p in self.path.split("/") if p]
            if parts == ["health"]:
                return self._reply({"status": "ok"})
            if parts and parts[0] == "tax":
                if state.tree is None:
                    return self._reply({"error": "no taxonomy loaded"}, 503)
                t = state.tree
                if len(parts) == 4 and parts[1] == "ancestor":
                    a, b = t.resolve(parts[2]), t.resolve(parts[3])
                    ca = t.common_ancestor(a, b)
                    return self._reply(
                        {"a": a, "b": b, "ancestor": ca,
                         "name": t.name_of(ca) if ca >= 0 else None}
                    )
                if len(parts) == 2:
                    import urllib.parse

                    tid = t.resolve(urllib.parse.unquote(parts[1]))
                    if tid < 0 or not t.valid(tid):
                        return self._reply({"error": "not found"}, 404)
                    return self._reply(
                        {
                            "taxid": tid,
                            "name": t.name_of(tid),
                            "lineage": t.lineage_string(tid),
                        }
                    )
            return self._reply({"error": "bad path"}, 404)

        def do_POST(self):
            if self.path == "/clade/classify":
                # QuickClade-with-server role (clade/CladeServer): POST a
                # fasta body, get the nearest reference clade
                if not state.clades:
                    return self._reply({"error": "no clade DB loaded"}, 503)
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                import tempfile

                from .clade import classify, profile_fasta

                with tempfile.NamedTemporaryFile(suffix=".fa") as tf:
                    tf.write(body)
                    tf.flush()
                    q = profile_fasta(tf.name)
                scored = classify(q, state.clades)
                score, best = scored[0]
                name = best.name
                if isinstance(name, bytes):
                    name = name.decode(errors="replace")
                return self._reply(
                    {"best": name, "absdif": float(score)}
                )
            if self.path == "/demux/assign":
                # DemuxServer/DemuxClient role (barcode/DemuxClient.java):
                # probability-model barcode assignment as a service
                n = int(self.headers.get("Content-Length", 0))
                try:
                    req = json.loads(self.rfile.read(n))
                    observed = [b.encode() for b in req["barcodes"]]
                    expected = [e.encode() for e in req["expected"]]
                    minprob = float(req.get("minprob", -5.6))
                except (ValueError, KeyError) as e:
                    return self._reply({"error": f"bad request: {e}"}, 400)
                from collections import Counter

                from .novademux import PCRMatrix

                model = PCRMatrix(expected)
                model.fit(Counter(observed))
                uniq = sorted(set(observed))
                best, logp = model.score(uniq)
                amap = {
                    bc: (expected[int(b)].decode() if lp >= minprob else None)
                    for bc, b, lp in zip(uniq, best, logp)
                }
                return self._reply(
                    {"assignments": [amap[bc] for bc in observed]}
                )
            if self.path != "/sketch/compare":
                return self._reply({"error": "bad path"}, 404)
            n = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(n))
                q = np.array(req["hashes"], dtype=np.uint64)
                k = int(req.get("k", 31))
            except (ValueError, KeyError) as e:
                return self._reply({"error": f"bad request: {e}"}, 400)
            from .sketch import compare_sketches

            out = []
            for name, hashes, k2 in state.sketches:
                if k2 != k:
                    continue
                wkid, ani, matches, _size = compare_sketches(q, hashes, k=k)
                out.append(
                    {"ref": name, "matches": int(matches),
                     "wkid": float(wkid), "ani": float(ani)}
                )
            out.sort(key=lambda d: -d["matches"])
            return self._reply({"results": out[:10]})

    return Handler


def start_server(state: ServerState, port: int = 0):
    """Returns (server, port); serve_forever runs on a daemon thread."""
    srv = ThreadingHTTPServer(("127.0.0.1", port), _make_handler(state))
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    return srv, srv.server_address[1]


def send_sketch(host: str, port: int, fasta: str, k: int = 31,
                size: int = 10000):
    """SendSketch client: sketch a file locally, POST it, return matches."""
    import urllib.request

    from .sketch import sketch_file

    hashes = sketch_file(fasta, k=k, size=size)
    req = urllib.request.Request(
        f"http://{host}:{port}/sketch/compare",
        data=json.dumps(
            {"hashes": [int(h) for h in hashes], "k": k}
        ).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read())


def main(argv=None):
    a = tokenize(argv if argv is not None else sys.argv[1:])
    state = ServerState()
    if a.get("names") and a.get("nodes"):
        state.load_tax(a.get("names"), a.get("nodes"))
    for path in (a.get("ref") or "").split(","):
        if path.strip():
            state.add_reference_fasta(path.strip(), k=a.get_int("k", default=31))
    for path in (a.get("clade", "claderef") or "").split(","):
        if path.strip():
            state.add_clade_fasta(path.strip())
    port = a.get_int("port", default=3068)
    srv, port = start_server(state, port)
    print(f"Server listening on 127.0.0.1:{port}", file=sys.stderr)
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        srv.shutdown()
    return srv
