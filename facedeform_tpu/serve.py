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

plus fit_seq/apply_seq (animated shots; both fit cmds take an optional
"reduce_k": K for the reduced-basis regression — all N markers constrain
K selected centers, ops/decimate.py), fit_dbse/morph (blendshapes),
fit_rig (inverse rigging), fit_psd/psd_delta (pose-space sculpt
corrections), refit (interactive drags), transport (attrs through the
deformation Jacobian), fit_skin (LBS bake: posed frames in, bones +
weights out, optional server-side .npz/.glb), fit_shapes (PCA blendshape
bake: posed frames in, morph targets + weight curves out, optional
server-side .npz/.glb) — see the Client methods below for signatures.

Array encoding: {"shape": [...], "dtype": "float32", "b64": "..."} or a
plain nested JSON list.

BINARY FRAMING (bulk streaming): the same port also speaks a
length-prefixed raw-buffer protocol, selected per-connection by the magic
bytes b"FDTB".  A frame is

    b"FDTB" | u32 header_len | header JSON | raw array payloads

where the header carries the same fields as a JSON request minus the
arrays, plus "arrays": [{"name", "shape", "dtype"}...] describing the
little-endian buffers concatenated after it (responses use the identical
frame shape).  base64 inflates 1M-vertex buffers by 33% and burns CPU on
encode/decode; raw framing measured ~6x faster round trips at 1M vertices.
Use the Client class below or any language with sockets + JSON.

Start:  python -m facedeform_tpu.serve --port 7707
"""

from __future__ import annotations

import argparse
import base64
import json
import socket
import socketserver
import struct
import sys
import threading
from typing import Dict, Optional, Tuple

import numpy as np

MAGIC = b"FDTB"

# Framing caps: the length prefix and array descriptors come off the wire
# untrusted — without bounds a corrupt/hostile frame demands a multi-GB
# allocation before any request validation runs.  16 MB of JSON header is
# orders of magnitude past any real request; 4 GB of payload covers a
# 350M-vertex f32 frame (the biggest meshes served are ~1M vertices).
MAX_HEADER_BYTES = 16 << 20
MAX_FRAME_PAYLOAD_BYTES = 4 << 30


def encode_array(a: np.ndarray) -> dict:
    # shape recorded BEFORE ascontiguousarray: it promotes 0-d arrays to
    # (1,) (CLAUDE.md trap — write_frame already guards, this path also
    # must or single-pose scalars like morph_ok grow a bogus axis)
    a = np.asarray(a)
    shape = list(a.shape)
    a = np.ascontiguousarray(a)
    return {
        "shape": shape,
        "dtype": str(a.dtype),
        "b64": base64.b64encode(a.tobytes()).decode("ascii"),
    }


def decode_array(obj) -> np.ndarray:
    if isinstance(obj, np.ndarray):  # binary-framed requests pass raw arrays
        return obj
    if isinstance(obj, dict):
        buf = base64.b64decode(obj["b64"])
        return np.frombuffer(buf, dtype=np.dtype(obj["dtype"])).reshape(obj["shape"]).copy()
    return np.asarray(obj, np.float32)


# ----------------------------------------------------------- binary framing
def write_frame(wfile, header: dict, arrays: Dict[str, np.ndarray]) -> None:
    """Write one binary frame: magic, u32 header length, JSON header with
    array descriptors, raw little-endian payloads (zero-copy memoryviews)."""
    metas = []
    views = []
    for name, a in arrays.items():
        shape = list(np.shape(a))  # BEFORE ascontiguousarray: it promotes
        a = np.ascontiguousarray(a)  # 0-d scalars (morph_ok) to (1,)
        metas.append({"name": name, "shape": shape, "dtype": str(a.dtype)})
        views.append(memoryview(a).cast("B"))
    hb = json.dumps(dict(header, arrays=metas)).encode()
    wfile.write(MAGIC + struct.pack("<I", len(hb)) + hb)
    for v in views:
        wfile.write(v)
    wfile.flush()


def _read_exact(rfile, n: int) -> bytes:
    chunks = []
    got = 0
    while got < n:
        c = rfile.read(n - got)
        if not c:
            raise ConnectionError("peer closed mid-frame")
        chunks.append(c)
        got += len(c)
    return b"".join(chunks)


def read_frame(rfile, magic_consumed: bool = False) -> Tuple[dict, Dict[str, np.ndarray]]:
    """Read one binary frame -> (header, arrays)."""
    if not magic_consumed:
        magic = _read_exact(rfile, 4)
        if magic != MAGIC:
            raise ValueError(f"bad frame magic {magic!r}")
    hlen = struct.unpack("<I", _read_exact(rfile, 4))[0]
    if hlen > MAX_HEADER_BYTES:
        raise ValueError(f"frame header {hlen} bytes exceeds {MAX_HEADER_BYTES}")
    header = json.loads(_read_exact(rfile, hlen))
    arrays: Dict[str, np.ndarray] = {}
    total = 0
    for m in header.pop("arrays", []):
        dt = np.dtype(m["dtype"])
        shape = m["shape"]
        if not all(isinstance(s, int) and s >= 0 for s in shape):
            raise ValueError(f"bad array shape {shape!r} in frame header")
        n = int(np.prod(shape, dtype=np.int64)) * dt.itemsize
        total += n
        if total > MAX_FRAME_PAYLOAD_BYTES:
            raise ValueError(
                f"frame payload exceeds {MAX_FRAME_PAYLOAD_BYTES} bytes"
            )
        buf = _read_exact(rfile, n)
        arrays[m["name"]] = np.frombuffer(buf, dtype=dt).reshape(shape)
    return header, arrays


class Client:
    """Binary-framed client for the deformation server (bulk streaming).

    >>> c = Client(port=7707)
    >>> did = c.fit(rest, deformed)
    >>> new_pts, falloff = c.apply(did, points)
    """

    def __init__(self, host: str = "127.0.0.1", port: int = 7707) -> None:
        self._sock = socket.create_connection((host, port))
        self._sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self._f = self._sock.makefile("rwb", buffering=1 << 20)

    def request(self, header: dict, arrays: Optional[Dict[str, np.ndarray]] = None):
        write_frame(self._f, header, arrays or {})
        resp, out = read_frame(self._f)
        if not resp.get("ok", False):
            raise RuntimeError(resp.get("error", "server error"))
        return resp, out

    def fit(self, rest_ctrl, deformed_ctrl, cfg: Optional[dict] = None,
            params: Optional[dict] = None, confidence=None,
            reduce_k: Optional[int] = None) -> str:
        """`reduce_k` switches to the reduced-basis regression (all N
        markers constrain K selected centers, decimate.fit_reduced)."""
        resp, _ = self.request(
            {"cmd": "fit", "cfg": cfg or {}, "params": params or {},
             **({"reduce_k": int(reduce_k)} if reduce_k else {})},
            {
                "rest_ctrl": np.asarray(rest_ctrl, np.float32),
                "deformed_ctrl": np.asarray(deformed_ctrl, np.float32),
                **(
                    {"confidence": np.asarray(confidence, np.float32)}
                    if confidence is not None else {}
                ),
            },
        )
        return resp["deformer"]

    def refit(self, deformer: str, deformed_ctrl) -> str:
        """Re-pose a fitted deformer's rig in place (interactive drag):
        ships ONLY the new pose; the server re-solves against the cached
        pose-independent factorization (deformer.FitPlan) at O(n^2).
        Raises if the deformer has no plan (PU/Krylov/checkpoint-loaded)."""
        resp, _ = self.request(
            {"cmd": "refit", "deformer": deformer},
            {"deformed_ctrl": np.asarray(deformed_ctrl, np.float32)},
        )
        return resp["deformer"]

    def apply(self, deformer: str, points, dist2=None, gate=None):
        arrays = {"points": np.asarray(points, np.float32)}
        if dist2 is not None:
            arrays["dist2"] = np.asarray(dist2, np.float32)
        if gate is not None:
            arrays["gate"] = np.asarray(gate, np.float32)
        _, out = self.request({"cmd": "apply", "deformer": deformer}, arrays)
        return out["points"], out["falloff"]

    def transport(self, deformer: str, points, weight, attrs: dict,
                  kinds: Optional[dict] = None, want_stretch: bool = False):
        """Transport point attrs through the deformer's deformation
        gradient server-side: (V, 3) attrs as vectors (N by the cofactor
        rule), (V, 4) as orientation quaternions.  Returns {name: array};
        with want_stretch, ({name: array}, (V, 3) singular values)."""
        arrays = {"points": np.asarray(points, np.float32),
                  "weight": np.asarray(weight, np.float32)}
        for n, a in attrs.items():
            arrays["attr:" + n] = np.asarray(a, np.float32)
        _, out = self.request(
            {"cmd": "transport", "deformer": deformer,
             "kinds": kinds or {}, "want_stretch": bool(want_stretch)},
            arrays,
        )
        moved = {n[5:]: a for n, a in out.items() if n.startswith("attr:")}
        if want_stretch:
            return moved, out["stretch"]
        return moved

    def fit_dbse(self, rest_points, shapes, cfg: Optional[dict] = None,
                 params: Optional[dict] = None) -> str:
        """Hold a blendshape basis resident server-side: (V, 3) rest +
        (S, V, 3) shapes.  cfg={'dbse_lstsq': False} bakes the
        reference-parity weight path (packed QR) into the basis."""
        resp, _ = self.request(
            {"cmd": "fit_dbse", "cfg": cfg or {}, "params": params or {}},
            {"rest": np.asarray(rest_points, np.float32),
             "shapes": np.asarray(shapes, np.float32)},
        )
        return resp["deformer"]

    def morph(self, deformer: str, points, cfg: Optional[dict] = None,
              params: Optional[dict] = None):
        """Project pose(s) into a fit_dbse blend subspace: (V, 3) or
        (F, V, 3) points -> (morphed points, weights, per-pose ok mask).
        Failed poses pass through unmorphed (mask False).  cfg/params
        override eval knobs per request (doclampweight, weight range,
        dofalloff + falloffradius residual)."""
        _, out = self.request(
            {"cmd": "morph", "deformer": deformer, "cfg": cfg or {},
             "params": params or {}},
            {"points": np.asarray(points, np.float32)},
        )
        return out["points"], out["weights"], out["morph_ok"].astype(bool)

    def fit_psd(self, rest_rig, posed_rigs, corrections,
                kernel: str = "GAUSSIAN", eps: Optional[float] = None,
                lam: float = 0.0, normalize: bool = False,
                align: bool = False) -> str:
        """Hold a pose-space sculpt-correction model resident
        (ops/psd.py): (N, 3) rest rig, (K, N, 3) example poses,
        (K, V, 3) sculpt-minus-base corrections.  align=True makes the
        model rigid-equivariant (Kabsch-registered descriptors,
        corrections carried in the rest frame)."""
        resp, _ = self.request(
            {"cmd": "fit_psd", "kernel": kernel, "lam": float(lam),
             "normalize": bool(normalize), "align": bool(align),
             **({"eps": float(eps)} if eps is not None else {})},
            {"rest_rig": np.asarray(rest_rig, np.float32),
             "posed_rigs": np.asarray(posed_rigs, np.float32),
             "corrections": np.asarray(corrections, np.float32)},
        )
        return resp["deformer"]

    def psd_delta(self, deformer: str, rest_rig, posed_rigs, points=None):
        """Blended corrections for (N, 3) or (F, N, 3) query poses ->
        ((V, 3) or (F, V, 3) field, (K,) or (F, K) weights).  With
        `points`, the correction is added and the sum returned instead —
        one round trip applies the fix to a whole shot."""
        arrays = {"rest_rig": np.asarray(rest_rig, np.float32),
                  "posed_rigs": np.asarray(posed_rigs, np.float32)}
        if points is not None:
            arrays["points"] = np.asarray(points, np.float32)
        _, out = self.request(
            {"cmd": "psd_delta", "deformer": deformer}, arrays
        )
        return out["points"], out["weights"]

    def fit_rig(self, rest_ctrl, rest_points, target_points, dist2=None,
                frame=None, cfg: Optional[dict] = None,
                params: Optional[dict] = None, register: bool = False,
                **kw):
        """Inverse rig fit server-side (inverse.fit_rig): recover the
        deformed rig that reproduces a target mesh pose.  Returns
        (deformed_ctrl, residual_rms, deformer_id_or_None); register=True
        also fits the recovered pose into a resident deformer.  kw passes
        ridge / subsample / max_iters / learning_rate / seed through."""
        arrays = {
            "rest_ctrl": np.asarray(rest_ctrl, np.float32),
            "rest_points": np.asarray(rest_points, np.float32),
            "target_points": np.asarray(target_points, np.float32),
        }
        if dist2 is not None:
            arrays["dist2"] = np.asarray(dist2, np.float32)
        if frame is not None:
            for k, f in zip(("tangentu", "tangentv", "normal"), frame):
                arrays[k] = np.asarray(f, np.float32)
        resp, out = self.request(
            {"cmd": "fit_rig", "cfg": cfg or {}, "params": params or {},
             "register": bool(register), **kw},
            arrays,
        )
        return (out["deformed_ctrl"], float(resp["residual_rms"]),
                resp.get("deformer"))

    def fit_seq(self, rest_ctrl, deformed_frames, cfg: Optional[dict] = None,
                params: Optional[dict] = None, confidence=None,
                temporal_smooth: Optional[int] = None,
                temporal_order: int = 2,
                reduce_k: Optional[int] = None) -> str:
        """One batched solve for an (F, N, 3) animated rig sequence.
        temporal_smooth=WINDOW (odd) Savitzky-Golay-filters the rig
        trajectories server-side before the fit (ops/temporal.py).
        reduce_k=K switches to the reduced-basis regression shot fit
        (decimate.fit_reduced_frames: all N markers constrain K centers,
        one shared factorization for every frame; composes with
        temporal_smooth, which runs first)."""
        resp, out = self.request(
            {"cmd": "fit_seq", "cfg": cfg or {}, "params": params or {},
             **({"temporal_smooth": int(temporal_smooth),
                 "temporal_order": int(temporal_order)}
                if temporal_smooth else {}),
             **({"reduce_k": int(reduce_k)} if reduce_k else {})},
            {
                "rest_ctrl": np.asarray(rest_ctrl, np.float32),
                "deformed_frames": np.asarray(deformed_frames, np.float32),
                **(
                    {"confidence": np.asarray(confidence, np.float32)}
                    if confidence is not None else {}
                ),
            },
        )
        return resp["deformer"]

    def fit_skin(self, rest_points, frames, bones: int = 16,
                 max_influences: int = 4, iters: int = 8, seed: int = 0,
                 faces=None, path: Optional[str] = None,
                 gltf: Optional[str] = None, gltf_fps: float = 24.0,
                 smooth_lambda: float = 0.0, flat_bones: bool = False):
        """Skinning-as-a-service: decompose (F, V, 3) posed frames into
        LBS bones (ops/skinning.py — the bake-skin core).  Returns
        (weights (V, B), rotations (F, B, 3, 3), translations (F, B, 3),
        relative_rmse).  path= checkpoints server-side (.npz, kind
        "skin"); gltf= writes a skinned .glb server-side (pass faces=
        (T, 3) for a viewable surface; default is the proximity-MST
        joint tree, flat_bones=True for the flat layout).
        smooth_lambda= adds Laplacian weight smoothing over the faces'
        edges (needs faces=)."""
        arrays = {
            "rest_points": np.asarray(rest_points, np.float32),
            "frames": np.asarray(frames, np.float32),
        }
        if faces is not None:
            arrays["faces"] = np.asarray(faces, np.int32)
        req = {"cmd": "fit_skin", "bones": int(bones),
               "max_influences": int(max_influences), "iters": int(iters),
               "seed": int(seed),
               "smooth_lambda": float(smooth_lambda),
               "flat_bones": bool(flat_bones)}
        if path:
            req["path"] = path
        if gltf:
            req["gltf"] = gltf
            req["gltf_fps"] = float(gltf_fps)
        resp, out = self.request(req, arrays)
        return (out["weights"], out["rotations"], out["translations"],
                float(resp["relative_rmse"]))

    def fit_shapes(self, rest_points, frames, rank: int = 4,
                   center: bool = True, faces=None,
                   path: Optional[str] = None, gltf: Optional[str] = None,
                   gltf_fps: float = 24.0):
        """Blendshape-bake-as-a-service: compress (F, V, 3) posed frames
        into a rank-`rank` PCA morph-target basis (ops/blendshapes.py —
        the deform-seq --gltf-rank core).  Returns (targets (K, V, 3),
        weights (F, K), rmse, energy).  path= checkpoints server-side
        (.npz, kind "shapes"); gltf= writes a morph-target .glb
        server-side (pass faces= for a viewable surface)."""
        arrays = {
            "rest_points": np.asarray(rest_points, np.float32),
            "frames": np.asarray(frames, np.float32),
        }
        if faces is not None:
            arrays["faces"] = np.asarray(faces, np.int32)
        req = {"cmd": "fit_shapes", "rank": int(rank),
               "center": bool(center)}
        if path:
            req["path"] = path
        if gltf:
            req["gltf"] = gltf
            req["gltf_fps"] = float(gltf_fps)
        resp, out = self.request(req, arrays)
        return (out["targets"], out["weights"],
                float(resp["rmse"]), float(resp["energy"]))

    def apply_seq(self, deformer: str, points, dist2=None, gate=None):
        """Evaluate every frame of a fit_seq model: (F, V, 3), (V,)."""
        arrays = {"points": np.asarray(points, np.float32)}
        if dist2 is not None:
            arrays["dist2"] = np.asarray(dist2, np.float32)
        if gate is not None:
            arrays["gate"] = np.asarray(gate, np.float32)
        _, out = self.request({"cmd": "apply_seq", "deformer": deformer}, arrays)
        return out["points"], out["falloff"]

    def save(self, deformer: str, path: str) -> None:
        """Checkpoint a fitted deformer server-side (any kind: dense, pu,
        seq, pu_seq — the matching utils/checkpoint codec is picked)."""
        self.request({"cmd": "save", "deformer": deformer, "path": path})

    def load(self, path: str, cfg: Optional[dict] = None,
             params: Optional[dict] = None) -> str:
        """Restore a server-side checkpoint; PU kinds take optional
        cfg/params eval knobs (the model file carries only the solve)."""
        resp, _ = self.request(
            {"cmd": "load", "path": path, "cfg": cfg or {},
             "params": params or {}}
        )
        return resp["deformer"]

    def info(self) -> dict:
        resp, _ = self.request({"cmd": "info"})
        return resp

    def shutdown(self) -> None:
        try:
            self.request({"cmd": "shutdown"})
        finally:
            self.close()

    def close(self) -> None:
        self._f.close()
        self._sock.close()


class DeformServer:
    """Request dispatcher holding named solved deformers."""

    def __init__(self) -> None:
        self._deformers: Dict[str, object] = {}
        # Pose-independent FitPlans riding alongside dense-route deformers
        # (same id): the `refit` cmd re-solves a marker drag at O(n^2)
        # without re-shipping the rest rig (deformer.FitPlan).
        self._plans: Dict[str, object] = {}
        self._counter = 0
        self._lock = threading.Lock()

    def _new_id(self) -> str:
        with self._lock:
            self._counter += 1
            return f"d{self._counter}"

    @staticmethod
    def _multi_chip_mesh():
        """Device mesh on a >1-chip server, else None — the same rule
        fit_shapes uses; PU patch solves accept it so multi-chip servers
        shard the fit instead of leaving chips idle (round-5 review
        finding)."""
        import jax

        if len(jax.devices()) > 1:
            from facedeform_tpu.parallel.sharding import make_mesh

            return make_mesh()
        return None

    def handle(self, req: dict, raw: bool = False) -> dict:
        """Dispatch one request.  raw=True (binary framing) keeps response
        arrays as np.ndarray values for the frame writer to stream;
        raw=False base64-encodes them for the JSON line protocol."""
        from facedeform_tpu.config import DeformConfig, DeformParams
        from facedeform_tpu.deformer import Deformer
        from facedeform_tpu.utils import checkpoint, errors

        def enc(a):
            a = np.asarray(a)
            return a if raw else encode_array(a)

        cmd = req.get("cmd")
        try:
            if cmd == "fit":
                cfg = DeformConfig(**req.get("cfg", {}))
                params = DeformParams(**req.get("params", {}))
                rest = decode_array(req["rest_ctrl"])
                deformed = decode_array(req["deformed_ctrl"])
                conf = (
                    decode_array(req["confidence"])
                    if "confidence" in req else None
                )
                plan = None
                if req.get("reduce_k"):
                    # reduced-basis regression: all N markers constrain
                    # K pivoted-Cholesky-selected centers
                    # (decimate.fit_reduced); a stock Deformer results
                    if cfg.solver == "pu":
                        return {
                            "ok": False,
                            "error": "reduce_k conflicts with solver='pu' "
                                     "(the K-center regression model is "
                                     "already any-N)",
                        }
                    from facedeform_tpu.ops import decimate

                    r_model, r_report, r_info = decimate.fit_reduced(
                        rest, deformed, int(req["reduce_k"]), cfg, params,
                        confidence=conf,
                    )
                    # a blown-up normal solve must be an error response,
                    # not a NaN deformer shipped with ok=true
                    errors.check_solve(r_report)
                    d = Deformer(model=r_model, cfg=cfg, params=params,
                                 report=r_report, reduced=True)
                    did = self._new_id()
                    self._deformers[did] = d
                    return {
                        "ok": True, "deformer": did, "plan": False,
                        "residual": float(r_report.residual_norm),
                        "centers": int(len(r_info.idx)),
                        "fit_rms": float(r_info.fit_rms),
                        "fit_max": float(r_info.fit_max),
                    }
                if cfg.solver == "pu":
                    # partition-of-unity route: the adapter exposes the
                    # same apply() contract, so downstream cmds just work
                    from facedeform_tpu.ops.pu import PUNodeDeformer

                    d = PUNodeDeformer.fit(
                        rest, deformed, cfg, params,
                        mesh_devices=self._multi_chip_mesh(),
                        confidence=conf,
                    )
                else:
                    from facedeform_tpu.deformer import FitPlan

                    if FitPlan.supports(cfg, int(rest.shape[0])):
                        # keep the factorization: `refit` drags are O(n^2)
                        d, plan = Deformer.fit_with_plan(
                            rest, deformed, cfg, params, confidence=conf
                        )
                    else:
                        d = Deformer.fit(rest, deformed, cfg, params,
                                         confidence=conf)
                did = self._new_id()
                self._deformers[did] = d
                if plan is not None:
                    self._plans[did] = plan
                return {
                    "ok": True, "deformer": did, "plan": plan is not None,
                    "residual": float(d.report.residual_norm),
                }
            if cmd == "refit":
                did = req.get("deformer")
                plan = self._plans.get(did)
                if plan is None:
                    return {
                        "ok": False,
                        "error": "deformer has no drag plan (unknown id, "
                                 "loaded from checkpoint, or a PU/Krylov "
                                 "route) — use fit",
                    }
                d = plan.refit(decode_array(req["deformed_ctrl"]))
                self._deformers[did] = d
                return {
                    "ok": True, "deformer": did,
                    "residual": float(d.report.residual_norm),
                }
            if cmd == "load":
                ck = checkpoint.kind(req["path"])
                if ck == "skin":
                    # skinning checkpoints are ENGINE EXPORTS (bones +
                    # weights for LBS runtimes), not servable deformers —
                    # a wire client can't call load_skinning(), so say
                    # what to do instead of leaking the Python-API hint
                    return {
                        "ok": False,
                        "error": "skin checkpoints are engine exports "
                                 "(bake-skin output), not servable "
                                 "deformers; load them in the consuming "
                                 "runtime or via "
                                 "utils.checkpoint.load_skinning",
                    }
                if ck == "shapes":
                    # same story: a blendshape bake (fit_shapes output)
                    # is an engine export, not a servable deformer
                    return {
                        "ok": False,
                        "error": "shapes checkpoints are engine exports "
                                 "(fit_shapes / --save-shapes output), "
                                 "not servable deformers; replay them "
                                 "via utils.checkpoint.load_blendshapes "
                                 "+ ops.blendshapes.apply_blendshapes",
                    }
                if ck == "seq":
                    model, cfg, params, resid = checkpoint.load_seq(
                        req["path"]
                    )
                    did = self._new_id()
                    self._deformers[did] = ("seq", model, cfg, params, resid)
                    return {
                        "ok": True, "deformer": did,
                        "frames": int(model.w_rbf.shape[0]),
                    }
                if ck == "pu_seq":
                    # sequence PU checkpoints carry the models, not eval
                    # knobs — optional cfg/params in the request set those
                    seq = checkpoint.load_pu_seq(req["path"])
                    did = self._new_id()
                    self._deformers[did] = (
                        "pu_seq", seq,
                        DeformConfig(**req.get("cfg", {})),
                        DeformParams(**req.get("params", {})),
                    )
                    return {
                        "ok": True, "deformer": did,
                        "frames": seq.num_frames,
                    }
                if ck == "psd":
                    psd_d = checkpoint.load_psd(req["path"])
                    did = self._new_id()
                    self._deformers[did] = (
                        "psd", psd_d,
                        np.asarray(psd_d.model.corrections, np.float32),
                    )
                    return {
                        "ok": True, "deformer": did,
                        "examples": int(psd_d.model.features.shape[0]),
                    }
                if ck == "pu":
                    # PU checkpoints carry the model, not eval knobs —
                    # optional cfg/params in the request set those
                    from facedeform_tpu.ops.pu import PUNodeDeformer

                    d = PUNodeDeformer(
                        pud=checkpoint.load_pu(req["path"]),
                        cfg=DeformConfig(**req.get("cfg", {})),
                        params=DeformParams(**req.get("params", {})),
                    )
                else:
                    d = checkpoint.load(req["path"])
                did = self._new_id()
                self._deformers[did] = d
                return {"ok": True, "deformer": did}
            if cmd == "apply" and isinstance(
                self._deformers.get(req.get("deformer")), tuple
            ):
                kind = self._deformers[req["deformer"]][0]
                hint = {"dbse": "morph", "psd": "psd_delta"}.get(
                    kind, "apply_seq"
                )
                return {
                    "ok": False,
                    "error": f"apply does not take a {kind} deformer "
                             f"(use {hint})",
                }
            if cmd == "save":
                d = self._deformers[req["deformer"]]
                from facedeform_tpu.ops.pu import PUNodeDeformer

                if isinstance(d, tuple) and d[0] == "dbse":
                    return {
                        "ok": False,
                        "error": "dbse bases are not checkpointable; "
                                 "refit from the shapes (fit_dbse is "
                                 "cheap: one Gram/QR over the blends)",
                    }
                if isinstance(d, tuple) and d[0] == "seq":
                    _, model, cfg, params = d[:4]
                    checkpoint.save_seq(
                        req["path"], model, cfg, params,
                        residuals=d[4] if len(d) > 4 else None,
                    )
                elif isinstance(d, tuple) and d[0] == "pu_seq":
                    checkpoint.save_pu_seq(req["path"], d[1])
                elif isinstance(d, tuple) and d[0] == "psd":
                    checkpoint.save_psd(req["path"], d[1])
                elif isinstance(d, PUNodeDeformer):
                    checkpoint.save_pu(req["path"], d.pud)
                else:
                    checkpoint.save(req["path"], d)
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
                    "points": enc(new_pts),
                    "falloff": enc(falloff),
                }
            if cmd == "transport":
                # Attribute transport over the wire: the render-farm side
                # of update_normals/transform_attrs/output_stretch — one
                # Jacobian pass serves a batch of attrs (+ stretches).
                d = self._deformers[req["deformer"]]
                if isinstance(d, tuple):
                    kind = d[0]
                    hint = (
                        "morph projects onto the basis; transport needs a "
                        "fit/fit_pu deformer" if kind == "dbse" else
                        "per-frame: load each frame or use the CLI batch "
                        "path"
                    )
                    return {
                        "ok": False,
                        "error": f"transport does not take a {kind} "
                                 f"deformer ({hint})",
                    }
                if not hasattr(d, "transform_attrs"):
                    return {
                        "ok": False,
                        "error": "transport unavailable for this deformer",
                    }
                from facedeform_tpu.ops.jacobian import infer_attr_kind

                pts = decode_array(req["points"])
                w = decode_array(req["weight"])
                attrs = {
                    k[5:]: decode_array(v) for k, v in req.items()
                    if isinstance(k, str) and k.startswith("attr:")
                }
                kinds = req.get("kinds") or None
                want_sig = bool(req.get("want_stretch", False))
                for n, a in attrs.items():
                    kind = (kinds or {}).get(n) or infer_attr_kind(n, a)
                    if kind is None:
                        return {
                            "ok": False,
                            "error": f"attribute {n!r}: shape "
                                     f"{tuple(a.shape)} is not "
                                     "transportable (need (V,3) or (V,4))",
                        }
                if want_sig:
                    moved, sig = d.transform_attrs(
                        pts, attrs, w, kinds=kinds, want_stretch=True
                    )
                else:
                    moved, sig = d.transform_attrs(
                        pts, attrs, w, kinds=kinds
                    ), None
                out = {
                    "attr:" + n: enc(np.asarray(a, np.float32))
                    for n, a in moved.items()
                }
                if sig is not None:
                    out["stretch"] = enc(np.asarray(sig, np.float32))
                return {"ok": True, **out}
            if cmd == "fit_dbse":
                # component F over the wire: hold a blendshape basis
                # resident (dbse.cpp:9-35), then morph many poses against
                # it — the solve-once / serve-many split applied to DBSE
                from facedeform_tpu.ops import dbse as dbse_ops

                cfg = DeformConfig(**req.get("cfg", {}))
                params = DeformParams(**req.get("params", {}))
                rest = decode_array(req["rest"]).astype(np.float32)
                shapes = decode_array(req["shapes"])
                if shapes.ndim != 3 or shapes.shape[1:] != rest.shape:
                    raise errors.ShapeMismatchError(
                        f"shapes {shapes.shape} must be (S,) + rest "
                        f"{rest.shape}"
                    )
                model = dbse_ops.build_model(
                    rest, list(shapes), parity=not cfg.dbse_lstsq
                )
                did = self._new_id()
                self._deformers[did] = ("dbse", model, rest, cfg, params)
                return {"ok": True, "deformer": did,
                        "shapes": int(shapes.shape[0])}
            if cmd == "morph":
                import dataclasses

                import jax.numpy as jnp

                from facedeform_tpu.ops import dbse as dbse_ops

                entry = self._deformers[req["deformer"]]
                if not (isinstance(entry, tuple) and entry[0] == "dbse"):
                    return {"ok": False,
                            "error": "morph needs a fit_dbse deformer"}
                _, model, rest, cfg, params = entry
                # eval-side knobs may be overridden per request; the
                # weight path is baked into the basis (the parity route
                # needs the packed QR built at fit time)
                if req.get("cfg"):
                    cfg = dataclasses.replace(cfg, **req["cfg"])
                if req.get("params"):
                    params = params._replace(**req["params"])
                if not cfg.dbse_lstsq and int(model.packed_qr.shape[0]) == 1:
                    return {
                        "ok": False,
                        "error": "basis was built with dbse_lstsq=True; "
                                 "refit with dbse_lstsq=False for the "
                                 "reference-parity weight path",
                    }
                warnings_out = []
                if cfg.dbse_robust and not cfg.dbse_lstsq:
                    # mirror node.py's warn-and-ignore contract instead of
                    # silently serving non-robust weights as if robust
                    warnings_out.append(
                        "dbse_robust requires the least-squares weight "
                        "path (dbse_lstsq=True); ignoring it for the "
                        "parity recipe."
                    )
                pts = decode_array(req["points"])
                single = pts.ndim == 2
                stack = (pts[None] if single else pts).astype(np.float32)
                if stack.ndim != 3 or stack.shape[1:] != rest.shape:
                    raise errors.ShapeMismatchError(
                        f"points {pts.shape} must be {rest.shape} or "
                        f"(F,) + {rest.shape}"
                    )
                rest_j = jnp.asarray(rest)
                cur = jnp.asarray(stack)
                if cfg.dbse_lstsq:
                    _w_batched = (
                        dbse_ops.weights_robust_batched
                        if cfg.dbse_robust
                        else dbse_ops.weights_lstsq_batched
                    )
                    w, rep = _w_batched(model, cur, rest_j)
                    ok = errors.frames_solve_ok(rep)
                    w_np = np.asarray(w, np.float32)
                else:
                    w = dbse_ops.weights_parity_batched(model, cur, rest_j)
                    w_np = np.asarray(w, np.float32)
                    ok = np.isfinite(w_np).all(axis=1)
                morphed = dbse_ops.morph_apply(
                    model, cur, rest_j, w, cfg, params
                )
                if not ok.all():
                    # failed poses pass through unmorphed (the node's
                    # warn-and-ignore contract, per pose)
                    morphed = jnp.where(
                        jnp.asarray(ok)[:, None, None], morphed, cur
                    )
                morphed_np = np.asarray(morphed, np.float32)
                ok_np = np.asarray(ok, np.uint8)
                if single:
                    # unbatch EVERY per-pose output so the single-pose
                    # contract is rank-consistent (points/weights/ok)
                    morphed_np, w_np, ok_np = morphed_np[0], w_np[0], ok_np[0]
                resp = {
                    "ok": True,
                    "points": enc(morphed_np),
                    "weights": enc(w_np),
                    "morph_ok": enc(ok_np),
                }
                if warnings_out:
                    resp["warnings"] = warnings_out
                return resp
            if cmd == "fit_psd":
                # pose-space deformation over the wire (ops/psd.py): hold
                # a sculpt-correction model resident, then psd_delta many
                # poses against it.  corrections are sculpt-minus-base as
                # the CALLER's pipeline derived them (the node path does
                # this automatically; serve is the lower-level API).
                from facedeform_tpu.config import RBFKernel
                from facedeform_tpu.ops import psd as psd_ops

                rest_rig = decode_array(req["rest_rig"]).astype(np.float32)
                posed = decode_array(req["posed_rigs"]).astype(np.float32)
                corr = decode_array(req["corrections"]).astype(np.float32)
                if posed.ndim != 3 or posed.shape[1:] != rest_rig.shape:
                    raise errors.ShapeMismatchError(
                        f"posed_rigs {posed.shape} must be (K,) + rest_rig "
                        f"{rest_rig.shape}"
                    )
                kernel = RBFKernel[str(req.get("kernel", "GAUSSIAN")).upper()]
                psd_d = psd_ops.PSDDeformer.fit(
                    rest_rig, posed, corr, kernel=kernel,
                    eps=req.get("eps"), lam=float(req.get("lam", 0.0)),
                    normalize=bool(req.get("normalize", False)),
                    align=bool(req.get("align", False)),
                )
                errors.check_solve(psd_d.report)
                did = self._new_id()
                # host corrections cached with the entry: psd_delta pulls
                # K scalars from the device and contracts on host (the
                # node.py convention — a (V, 3) device pull per request
                # would be tunnel-bound).  model.corrections, not the raw
                # request payload: align=True stores them rest-frame.
                self._deformers[did] = (
                    "psd", psd_d, np.asarray(psd_d.model.corrections,
                                             np.float32),
                )
                return {
                    "ok": True, "deformer": did,
                    "examples": int(posed.shape[0]),
                    "backward_error": float(psd_d.report.backward_error()),
                }
            if cmd == "psd_delta":
                from facedeform_tpu.ops import psd as psd_ops

                entry = self._deformers[req["deformer"]]
                if not (isinstance(entry, tuple) and entry[0] == "psd"):
                    return {"ok": False,
                            "error": "psd_delta needs a fit_psd deformer"}
                _, psd_d, corr = entry
                rest_rig = decode_array(req["rest_rig"]).astype(np.float32)
                posed = decode_array(req["posed_rigs"]).astype(np.float32)
                single = posed.ndim == 2
                stack = posed[None] if single else posed
                d_feat = int(psd_d.model.features.shape[1])
                if stack.ndim != 3 or stack.shape[1] * 3 != d_feat:
                    raise errors.ShapeMismatchError(
                        f"posed_rigs {posed.shape}: model was fitted for "
                        f"{d_feat // 3} rig markers"
                    )
                fr = [
                    psd_ops.pose_feature(rest_rig, stack[i], psd_d.align)
                    for i in range(stack.shape[0])
                ]
                feats = np.stack([f for f, _ in fr])
                w = np.atleast_2d(np.asarray(psd_ops.psd_weights(
                    psd_d.model, feats, psd_d.kernel, psd_d.normalize
                ), np.float32))
                delta = np.tensordot(w, corr, axes=1).astype(np.float32)
                if psd_d.align:
                    delta = np.einsum(
                        "fvc,fdc->fvd", delta, np.stack([r for _, r in fr])
                    ).astype(np.float32)
                if "points" in req:
                    pts = decode_array(req["points"]).astype(np.float32)
                    if pts.shape[-2:] != delta.shape[-2:]:
                        raise errors.ShapeMismatchError(
                            f"points {pts.shape} must end in "
                            f"{delta.shape[-2:]}"
                        )
                    delta = pts + delta if pts.ndim == delta.ndim else (
                        pts[None] + delta
                    )
                if single:
                    delta, w = delta[0], w[0]
                return {"ok": True, "points": enc(delta), "weights": enc(w)}
            if cmd == "fit_rig":
                # inverse rigging over the wire (inverse.fit_rig): a
                # sculpt/scan round-trips to a rig pose without shipping
                # solver state to the client; register=True also fits the
                # recovered pose into a resident deformer for apply
                from facedeform_tpu import inverse

                cfg = DeformConfig(**req.get("cfg", {}))
                params = DeformParams(**req.get("params", {}))
                rest_ctrl = decode_array(req["rest_ctrl"]).astype(np.float32)
                rest_pts = decode_array(req["rest_points"])
                tgt = decode_array(req["target_points"])
                if tgt.shape != rest_pts.shape:
                    raise errors.ShapeMismatchError(
                        f"target_points {tgt.shape} must match "
                        f"rest_points {rest_pts.shape}"
                    )
                from facedeform_tpu.ops import fit as fit_mod

                n_rig = int(rest_ctrl.shape[0])
                if cfg.solver == "pu" or fit_mod.uses_krylov(cfg, n_rig):
                    # same guard as the CLI invert: the linear map is a
                    # dense (N+m)^2 factorization with V RHS columns —
                    # past the dense limit it OOMs XLA's LU VMEM panels
                    # (and a stuck compile wedges the shared TPU tunnel)
                    return {
                        "ok": False,
                        "error": f"fit_rig materializes the dense "
                                 f"{n_rig}-marker linear map; rigs past "
                                 f"the dense limit "
                                 f"({fit_mod._KRYLOV_THRESHOLD}) aren't "
                                 "supported",
                    }
                dist2 = decode_array(req["dist2"]) if "dist2" in req else None
                frame = None
                if all(k in req for k in ("tangentu", "tangentv", "normal")):
                    frame = tuple(
                        decode_array(req[k])
                        for k in ("tangentu", "tangentv", "normal")
                    )
                res = inverse.fit_rig(
                    rest_ctrl, rest_pts, tgt, cfg, params, dist2=dist2,
                    frame=frame,
                    ridge=float(req.get("ridge", 1e-4)),
                    max_iters=int(req.get("max_iters", 200)),
                    learning_rate=float(req.get("learning_rate", 5e-2)),
                    subsample=req.get("subsample", 20000) or None,
                    seed=int(req.get("seed", 0)),
                )
                rec = np.asarray(res.deformed_ctrl, np.float32)
                resp = {
                    "ok": True,
                    "deformed_ctrl": enc(rec),
                    "residual_rms": float(res.residual_rms),
                    "iterations": int(res.iterations),
                }
                if req.get("register"):
                    if cfg.solver == "pu":
                        from facedeform_tpu.ops.pu import PUNodeDeformer

                        d = PUNodeDeformer.fit(rest_ctrl, rec, cfg, params)
                    else:
                        d = Deformer.fit(rest_ctrl, rec, cfg, params)
                    did = self._new_id()
                    self._deformers[did] = d
                    resp["deformer"] = did
                return resp
            if cmd == "fit_skin":
                # skinning-as-a-service (ops/skinning.py, the CLI
                # bake-skin core): posed frames in, engine-ready LBS out
                # — weights + per-pose transforms on the wire, optional
                # server-side .npz checkpoint and skinned .glb writes
                from facedeform_tpu.ops import skinning

                rest_pts = decode_array(req["rest_points"]).astype(
                    np.float32
                )
                frames = decode_array(req["frames"]).astype(np.float32)
                if frames.ndim != 3 or frames.shape[1:] != rest_pts.shape:
                    raise errors.ShapeMismatchError(
                        f"frames {frames.shape} must be "
                        f"(F,) + rest_points {rest_pts.shape}"
                    )
                skin_edges = None
                if "faces" in req:
                    from facedeform_tpu.geometry.topology import (
                        unique_edges,
                    )

                    skin_edges = unique_edges(
                        decode_array(req["faces"]).astype(np.int32)
                    )
                smooth_lam = float(req.get("smooth_lambda", 0.0))
                skin_warnings = []
                if smooth_lam > 0.0 and skin_edges is None:
                    # mirror the CLI bake-skin behavior (advisor r4: the
                    # two entry points disagreed — the CLI warned and
                    # proceeded unsmoothed while this handler let
                    # fit_skinning's ValueError surface as a generic
                    # protocol error): warn in the response, skip the
                    # smoothing term.
                    skin_warnings.append(
                        "smooth_lambda needs faces= (mesh edges); the "
                        "request is a point cloud — smoothing skipped"
                    )
                    smooth_lam = 0.0
                model, rep = skinning.fit_skinning(
                    rest_pts, frames,
                    n_bones=int(req.get("bones", 16)),
                    max_influences=int(req.get("max_influences", 4)),
                    outer_iters=int(req.get("iters", 8)),
                    seed=int(req.get("seed", 0)),
                    edges=skin_edges,
                    smooth_lambda=smooth_lam,
                )
                if req.get("path"):
                    checkpoint.save_skinning(req["path"], model, rep)
                if req.get("gltf"):
                    from facedeform_tpu.geometry.gltf_io import (
                        save_glb_skinned,
                    )
                    from facedeform_tpu.geometry.mesh import Mesh

                    faces = (
                        decode_array(req["faces"]).astype(np.int32)
                        if "faces" in req else None
                    )
                    save_glb_skinned(
                        req["gltf"], Mesh(points=rest_pts, faces=faces),
                        model, fps=float(req.get("gltf_fps", 24.0)),
                        hierarchy=not bool(req.get("flat_bones", False)),
                    )
                return {
                    "ok": True,
                    "weights": enc(np.asarray(model.weights, np.float32)),
                    "rotations": enc(
                        np.asarray(model.rotations, np.float32)
                    ),
                    "translations": enc(
                        np.asarray(model.translations, np.float32)
                    ),
                    "rmse": float(rep.rmse),
                    "relative_rmse": float(rep.relative_rmse),
                    **({"weight_roughness": float(rep.weight_roughness)}
                       if rep.weight_roughness is not None else {}),
                    **({"warnings": skin_warnings} if skin_warnings
                       else {}),
                }
            if cmd == "fit_shapes":
                # blendshape-bake-as-a-service (ops/blendshapes.py, the
                # deform-seq --gltf-rank core): posed frames in, PCA
                # morph targets + weight curves out — optional
                # server-side .npz checkpoint and morph-target .glb
                from facedeform_tpu.ops import blendshapes

                rest_pts = decode_array(req["rest_points"]).astype(
                    np.float32
                )
                frames = decode_array(req["frames"]).astype(np.float32)
                if frames.ndim != 3 or frames.shape[1:] != rest_pts.shape:
                    raise errors.ShapeMismatchError(
                        f"frames {frames.shape} must be "
                        f"(F,) + rest_points {rest_pts.shape}"
                    )
                # Multi-chip servers shard the bake over the vertex axis
                # (parallel/blendshapes_sharded); single-chip unchanged.
                import jax as _jax

                bs_mesh = None
                if len(_jax.devices()) > 1:
                    from facedeform_tpu.parallel.sharding import make_mesh

                    bs_mesh = make_mesh()
                model, rep = blendshapes.fit_blendshapes(
                    rest_pts, frames,
                    rank=int(req.get("rank", 4)),
                    center=bool(req.get("center", True)),
                    mesh=bs_mesh,
                )
                if req.get("path"):
                    checkpoint.save_blendshapes(req["path"], model, rep)
                if req.get("gltf"):
                    from facedeform_tpu.geometry.gltf_io import (
                        save_glb_targets,
                    )
                    from facedeform_tpu.geometry.mesh import Mesh

                    faces = (
                        decode_array(req["faces"]).astype(np.int32)
                        if "faces" in req else None
                    )
                    save_glb_targets(
                        req["gltf"], Mesh(points=rest_pts, faces=faces),
                        np.asarray(model.targets, np.float32),
                        np.asarray(model.weights, np.float32),
                        fps=float(req.get("gltf_fps", 24.0)),
                        names=model.target_names(),
                    )
                return {
                    "ok": True,
                    "targets": enc(np.asarray(model.targets, np.float32)),
                    "weights": enc(np.asarray(model.weights, np.float32)),
                    "rmse": float(rep.rmse),
                    "max_err": float(rep.max_err),
                    "energy": float(rep.energy),
                }
            if cmd == "fit_seq":
                # animated shot: ONE batched solve for all F posed rigs
                # (parallel/batched.fit_frames); apply_seq evaluates every
                # frame in one dispatch via the MXU frames kernel
                import jax.numpy as jnp

                from facedeform_tpu.parallel import batched

                cfg = DeformConfig(**req.get("cfg", {}))
                params = DeformParams(**req.get("params", {}))
                rest = decode_array(req["rest_ctrl"])
                frames = decode_array(req["deformed_frames"])
                if frames.ndim != 3 or frames.shape[1:] != rest.shape:
                    raise errors.ShapeMismatchError(
                        f"deformed_frames {frames.shape} must be "
                        f"(F,) + rest_ctrl {rest.shape}"
                    )
                conf = (
                    decode_array(req["confidence"])
                    if "confidence" in req else None
                )
                if req.get("temporal_smooth"):
                    # denoise tracker jitter before the batched solve
                    # (ops/temporal.py: SG filter over the frame axis)
                    from facedeform_tpu.ops import temporal

                    frames = temporal.smooth_frames(
                        frames, window=int(req["temporal_smooth"]),
                        order=int(req.get("temporal_order", 2)),
                    )
                if req.get("reduce_k"):
                    # reduced-basis regression shot: the design matrix
                    # reads only the rest rig, so all F frames share ONE
                    # factorization (decimate.fit_reduced_frames); the
                    # result is a stock frames-stacked model for apply_seq
                    if cfg.solver == "pu":
                        return {
                            "ok": False,
                            "error": "reduce_k conflicts with solver='pu' "
                                     "(the K-center regression model is "
                                     "already any-N)",
                        }
                    from facedeform_tpu.ops import decimate

                    r_model, r_report, r_info = decimate.fit_reduced_frames(
                        rest, frames, int(req["reduce_k"]), cfg, params,
                        confidence=conf,
                    )
                    errors.check_solve(r_report)
                    did = self._new_id()
                    self._deformers[did] = (
                        "seq", r_model, cfg, params, r_info.resid_norms
                    )
                    return {
                        "ok": True, "deformer": did,
                        "frames": int(frames.shape[0]),
                        "centers": int(len(r_info.idx)),
                        "residuals": enc(r_info.resid_norms),
                        "fit_rms": enc(r_info.fit_rms),
                    }
                if cfg.solver == "pu":
                    # any-N sequence: all frames share one patch
                    # factorization (ops/pu.fit_pu_frames) and one eval
                    # plan across apply_seq calls
                    from facedeform_tpu.ops.pu import (
                        PUSeqDeformer, node_fit_kwargs,
                    )

                    seq = PUSeqDeformer.fit(
                        rest, frames, **node_fit_kwargs(cfg, params),
                        mesh=self._multi_chip_mesh(),
                        confidence=conf,
                    )
                    errors.check_solve(seq.report)
                    did = self._new_id()
                    self._deformers[did] = ("pu_seq", seq, cfg, params)
                    # The PU solve shares one factorization across frames,
                    # so per-frame residual NORMS don't exist — report the
                    # aggregate once plus honest per-frame relative
                    # backward errors (worst column of each frame's 3)
                    f_n = int(frames.shape[0])
                    cb = np.asarray(seq.report.col_backward, np.float32)
                    return {
                        "ok": True, "deformer": did,
                        "frames": f_n,
                        "residual": float(seq.report.residual_norm),
                        "frame_backward_errors": enc(
                            cb.reshape(f_n, 3).max(axis=1)
                        ),
                    }
                model, resid = batched.fit_frames(
                    jnp.asarray(rest), jnp.asarray(frames), cfg, params,
                    confidence=(
                        jnp.asarray(conf, jnp.float32)
                        if conf is not None else None
                    ),
                )
                # same contract as every sibling fit path: a blown-up
                # solve is an error response, never a stored NaN model
                # with ok=true (round-5 review finding)
                errors.check_frames(resid, rest, frames)
                did = self._new_id()
                self._deformers[did] = (
                    "seq", model, cfg, params, np.asarray(resid)
                )
                return {
                    "ok": True, "deformer": did,
                    "frames": int(frames.shape[0]),
                    "residuals": enc(np.asarray(resid)),
                }
            if cmd == "apply_seq":
                import jax.numpy as jnp

                from facedeform_tpu.parallel import batched

                entry = self._deformers[req["deformer"]]
                if not (
                    isinstance(entry, tuple) and entry[0] in ("seq", "pu_seq")
                ):
                    return {
                        "ok": False,
                        "error": "apply_seq needs a fit_seq deformer "
                                 "(use apply for single-pose fits)",
                    }
                kind, model, cfg, params = entry[:4]
                pts = decode_array(req["points"])
                v = pts.shape[0]
                dist2 = (
                    decode_array(req["dist2"]) if "dist2" in req
                    else np.zeros(v, np.float32)
                )
                gate = (
                    decode_array(req["gate"]).astype(np.float32)
                    if "gate" in req else np.ones(v, np.float32)
                )
                if kind == "pu_seq":
                    out, falloff = model.apply_seq(
                        pts, dist2=dist2, gate=gate, cfg=cfg, params=params
                    )
                else:
                    out, falloff = batched.apply_frames(
                        model, jnp.asarray(pts), jnp.asarray(dist2),
                        jnp.asarray(gate), cfg, params, None,
                    )
                return {
                    "ok": True,
                    "points": enc(out),          # (F, V, 3)
                    "falloff": enc(falloff),
                }
            if cmd == "free":
                # evict a resident deformer: a long-lived solve-once/
                # serve-many server accumulates device-resident model
                # state per fit (PU patch stacks, (F, L, N, 3) weight
                # stacks) with no other remedy than a restart (round-5
                # review finding)
                did = req["deformer"]
                found = self._deformers.pop(did, None) is not None
                self._plans.pop(did, None)
                if not found:
                    return {
                        "ok": False, "error": f"unknown deformer {did!r}",
                    }
                return {"ok": True, "freed": did}
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
        # Protocol sniff: binary frames open with the magic, the JSON line
        # protocol with '{'.  Each connection commits to one protocol.
        # Sniff ONE byte first: demanding 4 up front deadlocked a JSON
        # client whose whole first line is shorter than 4 bytes (e.g.
        # b'{}\n') and glued pipelined short lines onto the next request
        # (round-5 review finding).  Only a first byte matching the
        # magic's (never the case for JSON, which starts with '{' or
        # whitespace) commits to reading the remaining 3.
        try:
            first = _read_exact(self.rfile, 1)
        except ConnectionError:
            return
        if first == MAGIC[:1]:
            try:
                rest = _read_exact(self.rfile, 3)
            except ConnectionError:
                return
            if first + rest == MAGIC:
                return self._handle_binary(magic_consumed=True)
            return self._handle_json(prefix=first + rest)
        self._handle_json(prefix=first)

    def _handle_json(self, prefix: bytes = b"") -> None:
        while True:
            # bounded like the binary header: an un-newlined multi-GB
            # stream must not balloon the server before validation runs
            line = prefix + self.rfile.readline(MAX_HEADER_BYTES + 1)
            prefix = b""
            if not line:
                return
            if len(line) > MAX_HEADER_BYTES and not line.endswith(b"\n"):
                self.wfile.write((json.dumps({
                    "ok": False,
                    "error": f"JSON line exceeds {MAX_HEADER_BYTES} bytes",
                }) + "\n").encode())
                self.wfile.flush()
                return  # cannot resync mid-line; drop the connection
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

    def _handle_binary(self, magic_consumed: bool = False) -> None:
        while True:
            try:
                header, arrays = read_frame(
                    self.rfile, magic_consumed=magic_consumed
                )
                magic_consumed = False
            except (ConnectionError, ValueError, KeyError, TypeError,
                    AttributeError):
                # Corrupt framing metadata (bad magic/length/shape/dtype or a
                # non-object header) leaves the stream unsyncable — drop the
                # connection rather than guess at the payload boundary.
                return
            req = dict(header, **arrays)
            resp = self.server.deform_server.handle(req, raw=True)
            out = {k: v for k, v in resp.items() if isinstance(v, np.ndarray)}
            meta = {k: v for k, v in resp.items() if not isinstance(v, np.ndarray)}
            write_frame(self.wfile, meta, out)
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
