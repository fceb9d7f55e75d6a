"""Deformer checkpoint/resume (solve-once, eval-many across sessions).

The reference's only serialization is rbfserialize/rbfunserialize of the
ALGLIB model for thread handoff (src/SOP_FaceDeform.cpp:374-377,
src/SOP_FaceDeform.hpp:132-133).  The rebuild's model is a plain pytree, so
checkpointing is: numpy-ify the leaves + record the static config.  Two
backends:

  * save/load        — single-file .npz, no extra deps, portable;
  * save_orbax/load_orbax — orbax-checkpoint directory format for users
    already in that ecosystem (sharding-aware restore).
"""

from __future__ import annotations

import dataclasses
import json
import os
import numpy as np
import jax.numpy as jnp

from facedeform_tpu.config import DeformConfig, DeformParams
from facedeform_tpu.deformer import Deformer
from facedeform_tpu.ops.fit import RBFModel
from facedeform_tpu.ops.solve import SolveReport

_FORMAT_VERSION = 1


#: marker -> (loader name, human label), in kind()'s dispatch priority
#: (a pu_seq file also carries dense-seq arrays, so pu_seq outranks seq)
_KINDS = {
    "pu_seq": ("load_pu_seq", "PU sequence"),
    "seq": ("load_seq", "dense sequence"),
    "pu": ("load_pu", "PU"),
    "psd": ("load_psd", "PSD"),
    "skin": ("load_skinning", "skinning"),
    "shapes": ("load_blendshapes", "blendshape"),
}


def _open_checkpoint(path: str, expect: str | None):
    """Shared load_* front door: .npz path fallback, kind dispatch, and
    the format-version gate — previously seven hand-copied blocks that
    had to be edited in lockstep (round-5 review finding).  `expect` is
    the marker key the calling loader owns (None = the dense Deformer
    checkpoint, which has no marker).  Returns (open NpzFile, resolved
    path); wrong-kind errors name the right loader."""
    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        path = path + ".npz"
    data = np.load(path, allow_pickle=False)
    found = next((k for k in _KINDS if k in data), None)
    if found != expect:
        data.close()
        if expect is None:
            loader, label = _KINDS[found]
            raise ValueError(
                f"{path} is a {label} checkpoint (use {loader}())"
            )
        _, want_label = _KINDS[expect]
        if found is None:
            raise ValueError(
                f"{path} is not a {want_label} checkpoint (use load())"
            )
        loader, label = _KINDS[found]
        raise ValueError(
            f"{path} is not a {want_label} checkpoint (it is a {label} "
            f"checkpoint — use {loader}())"
        )
    version = int(data["format_version"])
    if version > _FORMAT_VERSION:
        data.close()
        raise ValueError(
            f"checkpoint format {version} is newer than supported"
        )
    return data, path


def _cfg_to_json(cfg: DeformConfig) -> str:
    d = dataclasses.asdict(cfg)
    for k in ("model", "kernel", "term"):
        d[k] = int(d[k])
    return json.dumps(d)


def _cfg_from_json(s: str) -> DeformConfig:
    return DeformConfig(**json.loads(s))


def save(path: str, deformer: Deformer) -> None:
    """Serialize a solved Deformer to one .npz file."""
    params = deformer.params
    extra = {}
    if deformer.model.w_rbf_lo is not None:
        # double-float weight tails (precise eval path) round-trip too
        extra["w_rbf_lo"] = np.asarray(deformer.model.w_rbf_lo)
        extra["w_poly_lo"] = np.asarray(deformer.model.w_poly_lo)
    np.savez(
        path,
        format_version=_FORMAT_VERSION,
        cfg_json=_cfg_to_json(deformer.cfg),
        params=np.asarray(
            [float(v) for v in params[:8]], np.float64
        ),
        maxedges=int(params.maxedges),
        ctrl=np.asarray(deformer.model.ctrl),
        w_rbf=np.asarray(deformer.model.w_rbf),
        w_poly=np.asarray(deformer.model.w_poly),
        eps=np.asarray(deformer.model.eps),
        residual_norm=float(deformer.report.residual_norm),
        rhs_norm=float(deformer.report.rhs_norm),
        # reduced-basis regression marker (decimate.fit_reduced): keeps
        # the node's control-count-mismatch warning suppressed on resume
        reduced=int(getattr(deformer, "reduced", False)),
        **extra,
    )


def kind(path: str) -> str:
    """Checkpoint kind marker: 'dense' | 'pu' | 'seq' | 'pu_seq' | 'psd'
    | 'skin' | 'shapes'.

    Lets callers (serve's `load` cmd) dispatch to the right codec without
    trial-and-error; each load_* still validates the marker itself."""
    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        path = path + ".npz"
    with np.load(path, allow_pickle=False) as data:
        for k in _KINDS:
            if k in data:
                return k
    return "dense"


def load(path: str) -> Deformer:
    """Restore a Deformer saved by save(); ready for apply() immediately."""
    data, path = _open_checkpoint(path, None)
    cfg = _cfg_from_json(str(data["cfg_json"]))
    pvals = data["params"]
    params = DeformParams(
        qcoef=float(pvals[0]), zcoef=float(pvals[1]), radius=float(pvals[2]),
        lam=float(pvals[3]), falloffrate=float(pvals[4]),
        falloffradius=float(pvals[5]), weight_lo=float(pvals[6]),
        weight_hi=float(pvals[7]), maxedges=int(data["maxedges"]),
    )
    model = RBFModel(
        ctrl=jnp.asarray(data["ctrl"]),
        w_rbf=jnp.asarray(data["w_rbf"]),
        w_poly=jnp.asarray(data["w_poly"]),
        eps=jnp.asarray(data["eps"]),
        w_rbf_lo=jnp.asarray(data["w_rbf_lo"]) if "w_rbf_lo" in data else None,
        w_poly_lo=jnp.asarray(data["w_poly_lo"]) if "w_poly_lo" in data else None,
    )
    report = SolveReport(
        residual_norm=jnp.asarray(float(data["residual_norm"])),
        rhs_norm=jnp.asarray(float(data["rhs_norm"])),
    )
    return Deformer(model=model, cfg=cfg, params=params, report=report,
                    reduced=bool(data["reduced"]) if "reduced" in data
                    else False)


def save_orbax(path: str, deformer: Deformer) -> None:
    """Orbax directory checkpoint: model pytree + metadata json."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    payload = {
        k: v for k, v in deformer.model._asdict().items() if v is not None
    }
    ckpt.save(os.path.join(path, "model"), payload)
    ckpt.wait_until_finished()
    meta = {
        "format_version": _FORMAT_VERSION,
        "cfg": _cfg_to_json(deformer.cfg),
        "params": [float(v) for v in deformer.params[:8]],
        "maxedges": int(deformer.params.maxedges),
        "residual_norm": float(deformer.report.residual_norm),
        "rhs_norm": float(deformer.report.rhs_norm),
        "reduced": bool(getattr(deformer, "reduced", False)),
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def load_orbax(path: str) -> Deformer:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    ckpt = ocp.StandardCheckpointer()
    restored = ckpt.restore(os.path.join(path, "model"))
    model = RBFModel(**{
        k: jnp.asarray(v) for k, v in restored.items() if v is not None
    })
    p = meta["params"]
    params = DeformParams(
        qcoef=p[0], zcoef=p[1], radius=p[2], lam=p[3], falloffrate=p[4],
        falloffradius=p[5], weight_lo=p[6], weight_hi=p[7],
        maxedges=int(meta["maxedges"]),
    )
    report = SolveReport(
        residual_norm=jnp.asarray(meta["residual_norm"]),
        rhs_norm=jnp.asarray(meta["rhs_norm"]),
    )
    return Deformer(
        model=model, cfg=_cfg_from_json(meta["cfg"]), params=params,
        report=report, reduced=bool(meta.get("reduced", False)),
    )


# ------------------------------------------------------------- sequences
def save_seq(path: str, model: RBFModel, cfg: DeformConfig,
             params: DeformParams, residuals=None) -> None:
    """Serialize an F-stacked fit_frames model (parallel/batched.fit_frames)
    to one .npz: w_rbf carries the (F, L, N, 3) frame axis, ctrl/eps are
    frame-invariant.  The dense-sequence analogue of save(): a shot fitted
    once serves apply_seq across sessions without re-solving (the
    reference re-solves every cook, src/SOP_FaceDeform.cpp:330-368)."""
    params = params.clamped()
    f_n = int(model.w_rbf.shape[0])
    np.savez(
        path,
        format_version=_FORMAT_VERSION,
        seq=f_n,
        cfg_json=_cfg_to_json(cfg),
        params=np.asarray([float(v) for v in params[:8]], np.float64),
        maxedges=int(params.maxedges),
        ctrl=np.asarray(model.ctrl),
        w_rbf=np.asarray(model.w_rbf),
        w_poly=np.asarray(model.w_poly),
        eps=np.asarray(model.eps),
        residuals=(
            np.zeros(f_n, np.float32) if residuals is None
            else np.asarray(residuals, np.float32)
        ),
    )


def load_seq(path: str):
    """Restore (model, cfg, params, residuals) saved by save_seq().

    The model feeds parallel/batched.apply_frames directly."""
    data, path = _open_checkpoint(path, "seq")
    cfg = _cfg_from_json(str(data["cfg_json"]))
    pvals = data["params"]
    params = DeformParams(
        qcoef=float(pvals[0]), zcoef=float(pvals[1]), radius=float(pvals[2]),
        lam=float(pvals[3]), falloffrate=float(pvals[4]),
        falloffradius=float(pvals[5]), weight_lo=float(pvals[6]),
        weight_hi=float(pvals[7]), maxedges=int(data["maxedges"]),
    )
    model = RBFModel(
        ctrl=jnp.asarray(data["ctrl"]),
        w_rbf=jnp.asarray(data["w_rbf"]),
        w_poly=jnp.asarray(data["w_poly"]),
        eps=jnp.asarray(data["eps"]),
    )
    return model, cfg, params, np.asarray(data["residuals"])


def save_pu_seq(path: str, seq) -> None:
    """Serialize a PUSeqDeformer (ops/pu.py) to one .npz.

    The per-frame models share every static field (patches, ctrl, valid,
    eps — fit_pu_frames output), so geometry is stored once and only the
    (F, K, P, 3) weight / (F, K, m, 3) poly stacks carry the frame axis."""
    from facedeform_tpu.ops.pu import PUSeqDeformer

    if not isinstance(seq, PUSeqDeformer):
        raise ValueError(
            f"save_pu_seq expects a PUSeqDeformer, got {type(seq).__name__}"
        )
    models = [p.model for p in seq.puds]
    m, p = models[0], seq.patches
    rep = getattr(seq, "report", None)
    extra = {} if rep is None else dict(
        residual_norm=float(rep.residual_norm),
        rhs_norm=float(rep.rhs_norm),
        scale_norm=float(rep.scale_norm),
        col_backward=np.asarray(rep.col_backward),
    )
    np.savez(
        path,
        format_version=_FORMAT_VERSION,
        pu_seq=len(models),
        kernel=int(seq.kernel),
        term=int(seq.term),
        auto_eps=int(seq.auto_eps),
        centers=np.asarray(m.centers), radii=np.asarray(m.radii),
        ctrl=np.asarray(m.ctrl), valid=np.asarray(m.valid),
        eps=np.asarray(m.eps),
        w_hi=np.stack([np.asarray(mm.w_hi) for mm in models]),
        w_lo=np.stack([np.asarray(mm.w_lo) for mm in models]),
        poly_hi=np.stack([np.asarray(mm.poly_hi) for mm in models]),
        poly_lo=np.stack([np.asarray(mm.poly_lo) for mm in models]),
        p_idx=p.idx, p_counts=p.counts, p_spacing=p.spacing,
        **extra,
    )


def load_pu_seq(path: str):
    """Restore a PUSeqDeformer saved by save_pu_seq(); the restored shot
    shares one eval plan across frames exactly like a fresh fit."""
    from facedeform_tpu.config import PolyTerm, RBFKernel
    from facedeform_tpu.ops.pu import (
        PUDeformer, PUModel, PUPatches, PUSeqDeformer,
    )

    data, path = _open_checkpoint(path, "pu_seq")
    shared = dict(
        centers=jnp.asarray(data["centers"]), radii=jnp.asarray(data["radii"]),
        ctrl=jnp.asarray(data["ctrl"]), valid=jnp.asarray(data["valid"]),
        eps=jnp.asarray(data["eps"]),
    )
    models = [
        PUModel(
            w_hi=jnp.asarray(data["w_hi"][f]),
            w_lo=jnp.asarray(data["w_lo"][f]),
            poly_hi=jnp.asarray(data["poly_hi"][f]),
            poly_lo=jnp.asarray(data["poly_lo"][f]),
            **shared,
        )
        for f in range(int(data["pu_seq"]))
    ]
    patches = PUPatches(
        centers=np.asarray(data["centers"]), radii=np.asarray(data["radii"]),
        idx=np.asarray(data["p_idx"]), counts=np.asarray(data["p_counts"]),
        spacing=np.asarray(data["p_spacing"]),
    )
    seq = PUSeqDeformer(
        models, patches,
        RBFKernel(int(data["kernel"])), PolyTerm(int(data["term"])),
        auto_eps=bool(int(data["auto_eps"])),
    )
    if "residual_norm" in data:   # absent for report-less constructions
        seq.report = SolveReport(
            residual_norm=jnp.asarray(float(data["residual_norm"])),
            rhs_norm=jnp.asarray(float(data["rhs_norm"])),
            scale_norm=jnp.asarray(float(data["scale_norm"])),
            cond_est=None,
            col_backward=jnp.asarray(data["col_backward"]),
        )
    return seq


# -------------------------------------------------------------------- PU
def save_pu(path: str, pud) -> None:
    """Serialize a PUDeformer (ops/pu.py) to one .npz file.

    Stores the fitted PUModel arrays, the host patch geometry (so eval
    plans can be rebuilt), and the kernel/term/auto_eps statics; the
    aggregated report carries over for node messages."""
    from facedeform_tpu.ops.pu import PUDeformer

    if not isinstance(pud, PUDeformer):
        raise ValueError(
            f"save_pu expects a PUDeformer, got {type(pud).__name__} "
            "(use save() for global-RBF Deformers)"
        )
    m, p = pud.model, pud.patches
    np.savez(
        path,
        format_version=_FORMAT_VERSION,
        pu=1,
        kernel=int(pud.kernel),
        term=int(pud.term),
        auto_eps=int(pud.auto_eps),
        centers=np.asarray(m.centers), radii=np.asarray(m.radii),
        ctrl=np.asarray(m.ctrl), valid=np.asarray(m.valid),
        w_hi=np.asarray(m.w_hi), w_lo=np.asarray(m.w_lo),
        poly_hi=np.asarray(m.poly_hi), poly_lo=np.asarray(m.poly_lo),
        eps=np.asarray(m.eps),
        p_idx=p.idx, p_counts=p.counts, p_spacing=p.spacing,
        residual_norm=float(pud.report.residual_norm),
        rhs_norm=float(pud.report.rhs_norm),
        scale_norm=float(pud.report.scale_norm),
        col_backward=np.asarray(pud.report.col_backward),
    )


def load_pu(path: str):
    """Restore a PUDeformer saved by save_pu()."""
    from facedeform_tpu.config import PolyTerm, RBFKernel
    from facedeform_tpu.ops.pu import PUDeformer, PUModel, PUPatches

    data, path = _open_checkpoint(path, "pu")
    model = PUModel(
        centers=jnp.asarray(data["centers"]), radii=jnp.asarray(data["radii"]),
        ctrl=jnp.asarray(data["ctrl"]), valid=jnp.asarray(data["valid"]),
        w_hi=jnp.asarray(data["w_hi"]), w_lo=jnp.asarray(data["w_lo"]),
        poly_hi=jnp.asarray(data["poly_hi"]),
        poly_lo=jnp.asarray(data["poly_lo"]),
        eps=jnp.asarray(data["eps"]),
    )
    patches = PUPatches(
        centers=np.asarray(data["centers"]), radii=np.asarray(data["radii"]),
        idx=np.asarray(data["p_idx"]), counts=np.asarray(data["p_counts"]),
        spacing=np.asarray(data["p_spacing"]),
    )
    pud = PUDeformer(
        model, patches,
        RBFKernel(int(data["kernel"])), PolyTerm(int(data["term"])),
        auto_eps=bool(int(data["auto_eps"])),
    )
    pud.report = SolveReport(
        residual_norm=jnp.asarray(float(data["residual_norm"])),
        rhs_norm=jnp.asarray(float(data["rhs_norm"])),
        scale_norm=jnp.asarray(float(data["scale_norm"])),
        cond_est=None,
        col_backward=jnp.asarray(data["col_backward"]),
    )
    return pud


def save_psd(path: str, psd) -> None:
    """Serialize a PSDDeformer (ops/psd.py) to one .npz file.

    Stores the pose-space model (features/alpha/corrections/eps) plus the
    static kernel/normalize knobs; the solve report carries over for node
    messages.  The corrections tensor is (K, V, 3) — the dominant payload,
    same order as the rest mesh it was fitted against."""
    from facedeform_tpu.ops.psd import PSDDeformer

    if not isinstance(psd, PSDDeformer):
        raise ValueError(
            f"save_psd expects a PSDDeformer, got {type(psd).__name__}"
        )
    m = psd.model
    rep = psd.report
    extra = {}
    if rep is not None:
        extra["residual_norm"] = float(rep.residual_norm)
        extra["rhs_norm"] = float(rep.rhs_norm)
        if rep.scale_norm is not None:
            extra["scale_norm"] = float(rep.scale_norm)
    np.savez(
        path,
        format_version=_FORMAT_VERSION,
        psd=1,
        kernel=int(psd.kernel),
        normalize=int(bool(psd.normalize)),
        align=int(bool(psd.align)),
        features=np.asarray(m.features),
        alpha=np.asarray(m.alpha),
        corrections=np.asarray(m.corrections),
        psd_eps=np.asarray(m.eps),
        **extra,
    )


def load_psd(path: str):
    """Restore a PSDDeformer saved by save_psd()."""
    from facedeform_tpu.config import RBFKernel
    from facedeform_tpu.ops.psd import PSDDeformer, PSDModel

    data, path = _open_checkpoint(path, "psd")
    model = PSDModel(
        features=jnp.asarray(data["features"]),
        alpha=jnp.asarray(data["alpha"]),
        corrections=jnp.asarray(data["corrections"]),
        eps=jnp.asarray(data["psd_eps"]),
    )
    report = None
    if "residual_norm" in data:
        report = SolveReport(
            residual_norm=jnp.asarray(float(data["residual_norm"])),
            rhs_norm=jnp.asarray(float(data["rhs_norm"])),
            scale_norm=(jnp.asarray(float(data["scale_norm"]))
                        if "scale_norm" in data else None),
        )
    return PSDDeformer(
        model, RBFKernel(int(data["kernel"])),
        normalize=bool(int(data["normalize"])), report=report,
        align=bool(int(data["align"])) if "align" in data else False,
    )


def save_skinning(path: str, model, report=None) -> None:
    """Serialize a SkinningModel (ops/skinning.py) to one .npz file.

    The payload is exactly what an engine importer needs — (V, B) weights,
    per-training-pose (F, B, 3, 3)/(F, B, 3) bone transforms, and the rest
    positions the weights were fitted against; the report rides along so a
    later load can surface the decomposition quality without refitting."""
    from facedeform_tpu.ops.skinning import SkinningModel

    if not isinstance(model, SkinningModel):
        raise ValueError(
            f"save_skinning expects a SkinningModel, got {type(model).__name__}"
        )
    extra = {}
    if report is not None:
        extra["rmse"] = float(report.rmse)
        extra["max_err"] = float(report.max_err)
        extra["bbox_diag"] = float(report.bbox_diag)
        if report.weight_roughness is not None:
            extra["weight_roughness"] = float(report.weight_roughness)
    np.savez(
        path,
        format_version=_FORMAT_VERSION,
        skin=1,
        weights=np.asarray(model.weights),
        rotations=np.asarray(model.rotations),
        translations=np.asarray(model.translations),
        rest=np.asarray(model.rest),
        **extra,
    )


def load_skinning(path: str):
    """Restore (SkinningModel, SkinningReport | None) saved by
    save_skinning()."""
    from facedeform_tpu.ops.skinning import SkinningModel, SkinningReport

    data, path = _open_checkpoint(path, "skin")
    model = SkinningModel(
        weights=jnp.asarray(data["weights"]),
        rotations=jnp.asarray(data["rotations"]),
        translations=jnp.asarray(data["translations"]),
        rest=jnp.asarray(data["rest"]),
    )
    report = None
    if "rmse" in data:
        report = SkinningReport(
            rmse=float(data["rmse"]),
            max_err=float(data["max_err"]),
            bbox_diag=float(data["bbox_diag"]),
            weight_roughness=(
                float(data["weight_roughness"])
                if "weight_roughness" in data else None
            ),
        )
    return model, report


def save_blendshapes(path: str, model, report=None) -> None:
    """Serialize a BlendshapeModel (ops/blendshapes.py) to one .npz file.

    The payload is the full compressed-shot bake — rest positions, (K, V, 3)
    morph-target deltas, and the (F, K) weight curves — so a load can replay
    the shot (`apply_blendshapes`), re-export it (`save_glb_targets`), or
    feed the targets to the morphspace pass (`blendshape_meshes`).  The
    report rides along for quality surfacing without a refit."""
    from facedeform_tpu.ops.blendshapes import BlendshapeModel

    if not isinstance(model, BlendshapeModel):
        raise ValueError(
            f"save_blendshapes expects a BlendshapeModel, got "
            f"{type(model).__name__}"
        )
    extra = {}
    if report is not None:
        extra["rmse"] = float(report.rmse)
        extra["max_err"] = float(report.max_err)
        extra["energy"] = float(report.energy)
        extra["singular_values"] = np.asarray(
            report.singular_values, np.float64
        )
    np.savez(
        path,
        format_version=_FORMAT_VERSION,
        shapes=1,
        rest=np.asarray(model.rest),
        targets=np.asarray(model.targets),
        weights_curves=np.asarray(model.weights),
        **extra,
    )


def load_blendshapes(path: str):
    """Restore (BlendshapeModel, BlendshapeReport | None) saved by
    save_blendshapes()."""
    from facedeform_tpu.ops.blendshapes import BlendshapeModel, BlendshapeReport

    data, path = _open_checkpoint(path, "shapes")
    model = BlendshapeModel(
        rest=jnp.asarray(data["rest"]),
        targets=jnp.asarray(data["targets"]),
        weights=jnp.asarray(data["weights_curves"]),
    )
    report = None
    if "rmse" in data:
        report = BlendshapeReport(
            rmse=float(data["rmse"]),
            max_err=float(data["max_err"]),
            energy=float(data["energy"]),
            singular_values=np.asarray(data["singular_values"], np.float64),
        )
    return model, report
