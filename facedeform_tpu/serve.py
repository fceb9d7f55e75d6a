"""Deformation server: persistent solve-once / serve-many process.

The reference lives inside a Houdini session where the solved state
persists across cooks; standalone production use needs the same without
re-importing JAX and re-compiling per request.  This module serves the
Deformer API over a line-delimited JSON protocol on TCP (default
localhost), with large arrays as base64-encoded little-endian buffers.

Protocol (one JSON object per line, response per line):

  {"cmd": "fit", "rest_ctrl": <arr>, "deformed_ctrl": <arr>,
   "cfg": {...DeformConfig fields}, "params": {...DeformParams fields}}
      -> {"ok": true, "deformer": "<id>", "residual": r}
  {"cmd": "load", "path": "ckpt.npz"}            -> {"ok": true, "deformer": id}
  {"cmd": "save", "deformer": id, "path": p}     -> {"ok": true}
  {"cmd": "apply", "deformer": id, "points": <arr>,
   ["dist2": <arr>], ["gate": <arr>]}
      -> {"ok": true, "points": <arr>, "falloff": <arr>}
  {"cmd": "info"}                                -> backend, deformer list
  {"cmd": "shutdown"}                            -> stops the server

Array encoding: {"shape": [...], "dtype": "float32", "b64": "..."} or a
plain nested JSON list.

Start:  python -m facedeform_tpu.serve --port 7707
"""

from __future__ import annotations

import argparse
import base64
import json
import socketserver
import sys
import threading
from typing import Dict, Optional

import numpy as np


def encode_array(a: np.ndarray) -> dict:
    a = np.ascontiguousarray(a)
    return {
        "shape": list(a.shape),
        "dtype": str(a.dtype),
        "b64": base64.b64encode(a.tobytes()).decode("ascii"),
    }


def decode_array(obj) -> np.ndarray:
    if isinstance(obj, dict):
        buf = base64.b64decode(obj["b64"])
        return np.frombuffer(buf, dtype=np.dtype(obj["dtype"])).reshape(obj["shape"]).copy()
    return np.asarray(obj, np.float32)


class DeformServer:
    """Request dispatcher holding named solved deformers."""

    def __init__(self) -> None:
        self._deformers: Dict[str, object] = {}
        self._counter = 0
        self._lock = threading.Lock()

    def _new_id(self) -> str:
        with self._lock:
            self._counter += 1
            return f"d{self._counter}"

    def handle(self, req: dict) -> dict:
        from facedeform_tpu.config import DeformConfig, DeformParams
        from facedeform_tpu.deformer import Deformer
        from facedeform_tpu.utils import checkpoint, errors

        cmd = req.get("cmd")
        try:
            if cmd == "fit":
                cfg = DeformConfig(**req.get("cfg", {}))
                params = DeformParams(**req.get("params", {}))
                d = Deformer.fit(
                    decode_array(req["rest_ctrl"]),
                    decode_array(req["deformed_ctrl"]),
                    cfg, params,
                )
                did = self._new_id()
                self._deformers[did] = d
                return {
                    "ok": True, "deformer": did,
                    "residual": float(d.report.residual_norm),
                }
            if cmd == "load":
                d = checkpoint.load(req["path"])
                did = self._new_id()
                self._deformers[did] = d
                return {"ok": True, "deformer": did}
            if cmd == "save":
                checkpoint.save(req["path"], self._deformers[req["deformer"]])
                return {"ok": True}
            if cmd == "apply":
                d = self._deformers[req["deformer"]]
                pts = decode_array(req["points"])
                dist2 = decode_array(req["dist2"]) if "dist2" in req else None
                mask = (
                    decode_array(req["gate"]).astype(bool)
                    if "gate" in req else None
                )
                new_pts, falloff = d.apply(pts, dist2=dist2, group_mask=mask)
                return {
                    "ok": True,
                    "points": encode_array(np.asarray(new_pts)),
                    "falloff": encode_array(np.asarray(falloff)),
                }
            if cmd == "info":
                import jax

                return {
                    "ok": True,
                    "backend": jax.default_backend(),
                    "deformers": sorted(self._deformers),
                }
            if cmd == "shutdown":
                return {"ok": True, "shutdown": True}
            return {"ok": False, "error": f"unknown cmd {cmd!r}"}
        except errors.FaceDeformError as e:
            return {"ok": False, "error": str(e)}
        except KeyError as e:
            return {"ok": False, "error": f"missing/unknown key {e}"}
        except Exception as e:  # noqa: BLE001 — protocol boundary: a bad
            # request (unknown cfg field, bogus dtype, missing file) must
            # produce a JSON error line, not a dropped connection.
            return {"ok": False, "error": f"{type(e).__name__}: {e}"}


class _Handler(socketserver.StreamRequestHandler):
    def handle(self) -> None:
        while True:
            line = self.rfile.readline()
            if not line:
                return
            try:
                req = json.loads(line)
            except json.JSONDecodeError as e:
                resp = {"ok": False, "error": f"bad json: {e}"}
            else:
                resp = self.server.deform_server.handle(req)
            self.wfile.write((json.dumps(resp) + "\n").encode())
            self.wfile.flush()
            if resp.get("shutdown"):
                threading.Thread(target=self.server.shutdown, daemon=True).start()
                return


class _ThreadedTCP(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


def serve(host: str = "127.0.0.1", port: int = 7707, ready_event=None):
    """Blocking server loop; `ready_event.set()` fires once listening."""
    srv = _ThreadedTCP((host, port), _Handler)
    srv.deform_server = DeformServer()
    if ready_event is not None:
        srv.bound_port = srv.server_address[1]
        ready_event.set()
    print(f"facedeform-tpu serving on {host}:{srv.server_address[1]}", file=sys.stderr)
    srv.serve_forever()
    return srv


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="facedeform_tpu.serve")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=7707)
    args = ap.parse_args(argv)
    serve(args.host, args.port)
    return 0


if __name__ == "__main__":
    sys.exit(main())
