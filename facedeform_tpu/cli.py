"""Command-line interface: the node's parameter surface as flags.

The reference's UI is the Houdini parameter pane (component A,
src/SOP_FaceDeform.cpp:99-137); standalone users get the same 16-parameter
surface here:

    python -m facedeform_tpu deform mesh.obj rest_rig.obj deform_rig.obj \
        -o out.obj [--blend shape1.obj --blend shape2.obj] [flags]

plus a `bench` subcommand mirroring bench.py's headline measurement.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="facedeform_tpu",
        description="TPU-native RBF face deformation (facedeform rebuild)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("deform", help="deform a mesh from a control-rig pair")
    d.add_argument("mesh", help="rest-pose mesh (.obj/.geo/.hgeo, input 0)")
    d.add_argument("rest_rig", help="rest control rig (.obj/.geo/.hgeo, input 1)")
    d.add_argument("deform_rig", help="deformed control rig (.obj/.geo/.hgeo, input 2)")
    d.add_argument("-o", "--output", required=True, help="output path (.obj or .geo)")
    d.add_argument("--secondary", nargs=2, action="append", default=[],
                   metavar=("IN", "OUT"),
                   help="accessory mesh driven by the same solved field "
                        "(teeth, eyeballs, brows, collars): IN deforms "
                        "fully (no capture gate — capture binds the main "
                        "mesh) and writes to OUT; repeatable, one fit "
                        "serves every mesh")
    d.add_argument("--reduce-rig", type=int, default=None, metavar="K",
                   help="decimate an over-sampled rig to its K most "
                        "informative markers before fitting (greedy "
                        "pivoted-Cholesky / RKHS farthest-point sampling, "
                        "ops/decimate.py) — cuts both the solve and every "
                        "per-frame eval ~N/K-fold; prints the measured "
                        "field error at the dropped markers")
    d.add_argument("--reduce-mode", choices=("subset", "regress"),
                   default="subset",
                   help="subset (default): fit only the K kept markers "
                        "(interpolation).  regress: keep ALL N markers as "
                        "observations of a K-center ridge least-squares "
                        "model (decimate.fit_reduced) — on noisy tracker "
                        "rigs this averages ~N/K observations per center "
                        "instead of interpolating noise; KERNEL/QNN "
                        "families only")
    _add_cook_flags(d)

    s = sub.add_parser(
        "deform-seq",
        help="deform an animated sequence of posed rigs (one output per frame)",
    )
    s.add_argument("mesh", help="rest-pose mesh (.obj/.geo/.hgeo, input 0)")
    s.add_argument("rest_rig", help="rest control rig (.obj/.geo/.hgeo, input 1)")
    s.add_argument("deform_rigs", nargs="+",
                   help="posed control rigs, one per frame (input 2 over time)")
    s.add_argument("-o", "--outdir", required=True, help="output directory")
    s.add_argument("--out-pattern", default="frame_%04d.obj",
                   help="per-frame filename with a %%d frame index "
                        "(.obj or .geo; default frame_%%04d.obj)")
    s.add_argument("--batch", action="store_true",
                   help="batch all frame solves+evals into one dispatch "
                        "(parallel.batched.deform_frames): frame 0 cooks "
                        "through the full node (capture/falloff/group), "
                        "the rest ride the MXU frames kernel (tangent "
                        "fused); solver=pu shares one patch factorization "
                        "across frames (ops.pu.fit_pu_frames); morphspace "
                        "blends ride too (one vmapped DBSE weight solve "
                        "for the shot); falls back per-frame for "
                        "picked/krylov")
    s.add_argument("--temporal-smooth", type=int, default=None,
                   metavar="WINDOW",
                   help="Savitzky-Golay-smooth the posed-rig trajectories "
                        "over frames before fitting (odd window size): "
                        "tracker jitter stops shimmering the mesh, while "
                        "locally-polynomial motion (up to "
                        "--temporal-order) passes through exactly — no "
                        "amplitude loss or phase lag at motion extremes")
    s.add_argument("--temporal-order", type=int, default=2,
                   help="polynomial degree the temporal filter preserves "
                        "(default 2: quadratic motion arcs survive)")
    s.add_argument("--out-velocity", type=float, default=None, metavar="FPS",
                   help="write a per-frame `v` point attribute: backward "
                        "difference v_f = (P_f - P_{f-1}) * FPS (frame 0 "
                        "forward) — Houdini Trail SOP 'compute velocity' "
                        "semantics for motion blur; overwrites any "
                        "existing v attribute")
    s.add_argument("--gltf", default=None, metavar="PATH",
                   help="also write the whole shot as one glTF binary "
                        "(.glb): the rest mesh with one POSITION morph "
                        "target per frame (sparse accessors where the "
                        "deformation is localized) and a one-hot weights "
                        "animation — exact at every keyframe, plays in "
                        "any glTF viewer/engine (the lossless complement "
                        "to bake-skin --gltf)")
    s.add_argument("--gltf-fps", type=float, default=24.0,
                   help="keyframe rate for the .glb shot animation "
                        "(default 24)")
    s.add_argument("--gltf-rank", type=int, default=None, metavar="K",
                   help="compress the shot to K PCA morph targets plus a "
                        "mean target, with per-frame weight curves "
                        "(ops/blendshapes.py) — the L2-optimal K-target "
                        "bake (Eckart-Young) at O(K*V) bytes instead of "
                        "--gltf's lossless one-target-per-frame at "
                        "O(F*V); prints the reconstruction RMSE")
    s.add_argument("--save-shapes", default=None, metavar="PATH",
                   help="save the PCA blendshape bake as a .npz "
                        "checkpoint (requires --gltf-rank; replay via "
                        "utils.checkpoint.load_blendshapes + "
                        "ops.blendshapes.apply_blendshapes, or feed the "
                        "targets to the morphspace pass via "
                        "blendshape_meshes)")
    s.add_argument("--secondary", nargs=2, action="append", default=[],
                   metavar=("IN", "PATTERN"),
                   help="accessory mesh driven by the same per-frame "
                        "solves (teeth, eyeballs, ...): IN deforms fully "
                        "(no capture gate) every frame and writes to "
                        "outdir/PATTERN %% frame (e.g. teeth_%%04d.obj); "
                        "repeatable; rides the --batch dispatch too")
    s.add_argument("--reduce-rig", type=int, default=None, metavar="K",
                   help="decimate an over-sampled rig to its K most "
                        "informative markers before fitting (greedy "
                        "pivoted-Cholesky / RKHS farthest-point sampling; "
                        "selection reads only the REST rig, so one index "
                        "set slices every frame of the shot); prints the "
                        "measured field error at the dropped markers on "
                        "frame 0; runs before --temporal-smooth/"
                        "--symmetrize")
    s.add_argument("--reduce-mode", choices=("subset", "regress"),
                   default="subset",
                   help="subset drops markers and refits (default); "
                        "regress keeps ALL N markers as observations of a "
                        "K-center ridge least-squares model "
                        "(decimate.fit_reduced_frames) — the design "
                        "matrix depends only on the rest rig, so the "
                        "whole shot shares ONE factorization (3F RHS "
                        "columns); on noisy tracker shots regression "
                        "averages instead of interpolating the noise")
    _add_cook_flags(s)

    inv = sub.add_parser(
        "invert",
        help="recover the deformed control rig that reproduces a target "
             "mesh pose (inverse.fit_rig: the reverse problem the "
             "reference plugin cannot solve)",
    )
    inv.add_argument("mesh", help="rest-pose mesh (.obj/.geo/.hgeo, input 0)")
    inv.add_argument("rest_rig",
                     help="rest control rig (.obj/.geo/.hgeo, input 1)")
    inv.add_argument("target",
                     help="target mesh pose (sculpt/scan; same point count "
                          "as the rest mesh)")
    inv.add_argument("-o", "--output", required=True,
                     help="recovered rig output path (.obj or .geo) — feed "
                          "it back to `deform` as input 2")
    _add_invert_flags(inv)

    doc = sub.add_parser(
        "doctor",
        help="lint a mesh/rig input set before fitting: duplicate markers, "
             "radius sanity, capture coverage, solve conditioning, "
             "symmetry detection, tracker jitter",
    )
    doc.add_argument("mesh", help="rest-pose mesh (.obj/.geo/.hgeo)")
    doc.add_argument("rest_rig", help="rest control rig")
    doc.add_argument("posed_rigs", nargs="*",
                     help="posed rig(s); enables the solve probe, pose "
                          "asymmetry and (5+ frames) tracker-jitter checks")
    doc.add_argument("--group", default=None,
                     help="point group/pattern the deform would write")
    doc.add_argument("--json", action="store_true", dest="as_json",
                     help="machine-readable findings + stats on stdout")
    doc.add_argument("--no-solve", dest="probe_solve", action="store_false",
                     help="skip the test solve (host-only checks)")
    _add_model_flags(doc)

    bs = sub.add_parser(
        "bake-skin",
        help="bake a pose sweep to linear-blend skinning (virtual bones + "
             "vertex weights) for engine export (ops/skinning.py)",
    )
    bs.add_argument("mesh", help="rest-pose mesh (.obj/.geo/.hgeo, input 0)")
    bs.add_argument("rest_rig", help="rest control rig (.obj/.geo/.hgeo)")
    bs.add_argument("deform_rigs", nargs="+",
                    help="posed control rigs spanning the motion to bake "
                         "(with --from-meshes: posed MESHES instead — skip "
                         "the deformer and decompose the given frames)")
    bs.add_argument("-o", "--output", required=True,
                    help="skinning checkpoint output (.npz: weights, "
                         "per-pose bone transforms, rest positions; load "
                         "with utils.checkpoint.load_skinning)")
    bs.add_argument("--bones", type=int, default=16,
                    help="number of virtual bones (default 16)")
    bs.add_argument("--max-influences", type=int, default=4,
                    help="max bones per vertex (default 4, the common "
                         "engine budget)")
    bs.add_argument("--skin-iters", type=int, default=8,
                    help="transform<->weight alternation rounds (default 8)")
    bs.add_argument("--seed", type=int, default=0,
                    help="bone-seeding RNG (k-means++ over local rigid "
                         "features)")
    bs.add_argument("--from-meshes", action="store_true",
                    help="positional inputs after the rest rig are posed "
                         "meshes (same point count as the rest mesh); no "
                         "deformer cook happens and the rest rig argument "
                         "is ignored")
    bs.add_argument("--write-frames", default=None, metavar="DIR",
                    help="also write the LBS reconstruction of every "
                         "training pose to DIR (frame_%%04d.obj) for "
                         "side-by-side QC against the deformer output")
    bs.add_argument("--gltf", default=None, metavar="PATH",
                    help="also write a glTF binary (.glb): skinned mesh "
                         "with JOINTS/WEIGHTS vertex attrs, one joint per "
                         "bone, and an animation stepping through the "
                         "baked poses — imports directly into engines "
                         "and glTF viewers")
    bs.add_argument("--gltf-fps", type=float, default=24.0,
                    help="keyframe rate for the .glb pose animation "
                         "(default 24)")
    bs.add_argument("--flat-bones", action="store_true",
                    help="export the .glb with B parentless joints under "
                         "one armature node (identity inverse binds) "
                         "instead of the default proximity-MST joint "
                         "tree rooted near the bone-centroid mean")
    bs.add_argument("--smooth-weights", type=float, default=0.0,
                    metavar="LAMBDA",
                    help="Laplacian weight-smoothness regularization over "
                         "the mesh edges (unitless; 0.03-0.3 useful, "
                         "0.1 measured to cut boundary roughness ~3.7x "
                         "for +15%% RMSE on a noisy sweep); needs faces")
    _add_cook_flags(bs)

    b = sub.add_parser("bench", help="run the headline benchmark")
    b.add_argument("--verts", type=int, default=1_000_000)
    b.add_argument("--controls", type=int, default=1000)

    wm = sub.add_parser(
        "warm",
        help="precompile the common program set at your session's shapes "
             "into the persistent compile cache (facedeform_tpu/warmup.py)"
             " — first-session cold compiles cost 10-240s/program on the "
             "remote-compile TPU runtime; run this once per shape set",
    )
    wm.add_argument("--verts", type=int, default=1_000_000,
                    help="mesh vertex count to warm for (default 1M)")
    wm.add_argument("--controls", type=int, default=1000,
                    help="control-rig size to warm for (default 1000)")
    wm.add_argument("--frames", type=int, default=0,
                    help="also warm the animated-sequence programs at "
                         "this frame count (default off)")
    # dest differs from the cook-level `solver` that _add_model_flags
    # pins to "auto" via set_defaults: sharing the dest let set_defaults
    # override this default AND made an explicit `--solver dense` reach
    # DeformConfig, which rejects "dense" (review finding, round 5)
    wm.add_argument("--solver", dest="warm_solver",
                    choices=["dense", "pu"], default="dense",
                    help="dense warms fit + Pallas evals (default); pu "
                         "warms the partition-of-unity route (fit_pu + "
                         "Mosaic tile eval; the worst cold compile — "
                         "307 s measured at a fresh 200k patch width)")
    wm.add_argument("--queries", type=int, default=500_000,
                    help="PU eval query-point count (--solver pu)")
    wm.add_argument("--patch-size", type=int, default=192,
                    help="PU patch size (--solver pu; match your fit)")
    wm.add_argument("--overlap", type=float, default=1.3,
                    help="PU patch overlap (--solver pu)")
    wm.add_argument("--transport", action="store_true",
                    help="also warm attribute-transport programs (normal "
                         "transport, frames transport at --frames, and "
                         "the morph/PSD-composed 1-ring gradient path)")
    wm.add_argument("--skin", action="store_true",
                    help="also warm the skinning decomposition (98 s cold "
                         "at 100k x 24 x 8 measured) + lbs_apply")
    wm.add_argument("--bones", type=int, default=24,
                    help="skinning bone count (--skin)")
    wm.add_argument("--poses", type=int, default=8,
                    help="skinning pose-sweep length (--skin)")
    wm.add_argument("--dbse", action="store_true",
                    help="also warm the morphspace (DBSE) programs at "
                         "--verts with --shapes blendshapes")
    wm.add_argument("--shapes", type=int, default=8,
                    help="blendshape count (--dbse)")
    _add_model_flags(wm)
    return p


def _add_cook_flags(d) -> None:
    """The node's 16-parameter surface, shared by deform and deform-seq."""
    d.add_argument("--blend", action="append", default=[],
                   help="blendshape OBJ (repeatable; inputs 3+)")
    d.add_argument("--group", default=None,
                   help="named point group restricting which mesh points "
                        "deform (stored in the .attrs.npz sidecar; the "
                        "reference node's `group` parameter)")
    # the reference's parameter surface (defaults match the PRM templates)
    d.add_argument("--model", choices=["qnn", "multilayer", "kernel"],
                   default="qnn")
    d.add_argument("--kernel", choices=["gaussian", "thin_plate",
                   "multiquadric", "inverse_multiquadric", "linear", "cubic",
                   "wendland_c2"], default="gaussian")
    d.add_argument("--term", choices=["linear", "constant", "zero"],
                   default="linear")
    d.add_argument("--solver", choices=["auto", "direct", "krylov", "pu"],
                   default="auto",
                   help="RBF solve route; 'pu' = partition-of-unity "
                        "(any-N rigs at dense double-float precision)")
    d.add_argument("--qcoef", type=float, default=1.0)
    d.add_argument("--zcoef", type=float, default=5.0)
    d.add_argument("--radius", type=float, default=1.0)
    d.add_argument("--maxedges", type=int, default=4)
    d.add_argument("--layers", type=int, default=4)
    d.add_argument("--lambda", dest="lam", type=float, default=0.1)
    d.add_argument("--tangent", action="store_true")
    d.add_argument("--morphspace", action="store_true")
    d.add_argument(
        "--dbse-robust", action="store_true",
        help="Huber-IRLS morphspace weights: scan outliers (occlusion "
        "holes, glints) stop dragging the blendshape projection",
    )
    d.add_argument("--clamp-weights", action="store_true")
    d.add_argument("--weight-range", type=float, nargs=2, default=[0.0, 1.0])
    d.add_argument("--falloff", action="store_true", dest="dofalloff")
    d.add_argument("--falloff-radius", type=float, default=1.0)
    d.add_argument("--falloff-rate", type=float, default=1.0)
    d.add_argument("--falloff-metric", choices=["euclidean", "geodesic"],
                   default="euclidean",
                   help="falloff distance measure: straight-line to the "
                        "rig (reference semantics) or along the mesh edge "
                        "graph (no bleed across surface gaps, e.g. upper "
                        "to lower lip)")
    d.add_argument("--autotune", action="store_true",
                   help="pick the RBF radius (QNN: the q/z scale) by "
                        "leave-one-out cross-validation before fitting "
                        "(Rippa closed form — one factorization per "
                        "candidate, no refits)")
    d.add_argument("--autotune-ridge", action="store_true",
                   help="with --autotune: also select lambda by LOOCV "
                        "(MULTILAYER/KERNEL families)")
    d.add_argument("--example", nargs=2, action="append", default=[],
                   metavar=("POSED_RIG", "SCULPT"),
                   help="pose-space deformation example (repeatable): a "
                        "posed rig and the artist-corrected mesh at that "
                        "pose; the blended correction is added after the "
                        "morph pass and reproduces each sculpt exactly at "
                        "its own pose (ops/psd.py)")
    d.add_argument("--psd-lambda", type=float, default=0.0,
                   help="pose-space ridge (default 0: exact interpolation "
                        "of the sculpts)")
    d.add_argument("--psd-eps", type=float, default=None,
                   help="pose-space kernel radius (default: median "
                        "pairwise example-pose distance)")
    d.add_argument("--psd-normalize", action="store_true",
                   help="rescale pose-space weights toward sum 1 where "
                        "their sum is significant (normalized RBF)")
    d.add_argument("--psd-align", action="store_true",
                   help="rigid-invariant pose descriptors: remove each "
                        "pose's best-fit rigid transform (Kabsch) before "
                        "the pose-space kernel and rotate corrections "
                        "with the head — tracked rigs carry head motion")
    d.add_argument("--save-psd", metavar="PATH", default=None,
                   help="checkpoint the fitted pose-space model (.npz); "
                        "reload with --load-psd to skip re-cooking the "
                        "examples")
    d.add_argument("--load-psd", metavar="PATH", default=None,
                   help="apply a pose-space model saved by --save-psd "
                        "(no example cooks; --example wins if both given)")
    d.add_argument("--symmetrize", choices=["x", "y", "z"], default=None,
                   help="close the rig under a mirror reflection before "
                        "the fit (paired markers get averaged symmetric "
                        "displacements, unpaired markers are mirrored in) "
                        "so the deformation is exactly symmetric")
    d.add_argument("--symmetry-tol", type=float, default=None,
                   help="marker mirror-pairing tolerance (default: 5%% of "
                        "the median marker spacing)")
    d.add_argument("--strict-parity", action="store_true",
                   help="preserve reference quirks verbatim (SURVEY.md)")
    d.add_argument("--picked", action="store_true",
                   help="write the eval-pass falloff color viz to Cd (the "
                        "reference's selected-node behavior)")
    d.add_argument("--save-deformer",
                   help="checkpoint the solved deformer (.npz); with "
                        "deform-seq --batch, the whole F-frame sequence")
    d.add_argument("--load-deformer",
                   help="resume a checkpointed solve (.npz from "
                        "--save-deformer): deform skips the fit; solve-"
                        "model flags come from the checkpoint, eval flags "
                        "still apply")
    d.add_argument("--update-normals", action="store_true",
                   help="transport the N point attribute through the "
                        "deformation's analytic Jacobian (the reference "
                        "leaves rest-pose normals on the deformed surface)")
    d.add_argument("--transform-attrs", metavar="NAMES",
                   help="comma-separated point attributes to transport "
                        "through the deformation gradient: (V,3) attrs as "
                        "vectors (v' = F v; N by the cofactor rule), (V,4) "
                        "as orientation quaternions (rotation factor of F)")
    d.add_argument("--output-stretch", action="store_true",
                   help="write fd_stretch/fd_compress point attrs (max/min "
                        "singular value of the deformation gradient): "
                        "rigging QC for stretched or pinched regions")
    d.add_argument("--recompute-normals", action="store_true",
                   help="rebuild N geometrically from the deformed faces "
                        "(area-weighted; reflects the morph pass too, "
                        "unlike --update-normals' analytic transport)")
    d.add_argument("--timing", action="store_true", help="print per-stage ms")


def _add_model_flags(d) -> None:
    """The solve-model + falloff-shape surface shared by `invert` and
    `doctor` (no eval-only/morphspace flags).  Pins the cook flags these
    subcommands don't expose so `_cfg_params_from` works unchanged."""
    d.add_argument("--model", choices=["qnn", "multilayer", "kernel"],
                   default="qnn")
    d.add_argument("--kernel", choices=["gaussian", "thin_plate",
                   "multiquadric", "inverse_multiquadric", "linear", "cubic",
                   "wendland_c2"], default="gaussian")
    d.add_argument("--term", choices=["linear", "constant", "zero"],
                   default="linear")
    d.add_argument("--qcoef", type=float, default=1.0)
    d.add_argument("--zcoef", type=float, default=5.0)
    d.add_argument("--radius", type=float, default=1.0)
    d.add_argument("--maxedges", type=int, default=4)
    d.add_argument("--layers", type=int, default=4)
    d.add_argument("--lambda", dest="lam", type=float, default=0.1)
    d.add_argument("--tangent", action="store_true",
                   help="model the forward pass's tangent projection "
                        "(invert: forces the gradient-descent path)")
    d.add_argument("--falloff", action="store_true", dest="dofalloff",
                   help="model the forward pass's capture falloff gate "
                        "(real distances; otherwise captured verts get "
                        "falloff 1, matching the forward default)")
    d.add_argument("--falloff-rate", type=float, default=1.0)
    d.add_argument("--falloff-metric", choices=["euclidean", "geodesic"],
                   default="euclidean")
    d.add_argument("--strict-parity", action="store_true")
    d.set_defaults(morphspace=False, dbse_robust=False, clamp_weights=False,
                   weight_range=[0.0, 1.0], falloff_radius=1.0, solver="auto")


def _add_invert_flags(d) -> None:
    """fit_rig's knobs on top of the shared model surface."""
    d.add_argument("--group", default=None,
                   help="point group/pattern restricting which mesh points "
                        "constrain the fit (the forward pass only writes "
                        "these, so only they carry signal)")
    _add_model_flags(d)
    d.add_argument("--ridge", type=float, default=1e-4,
                   help="Tikhonov weight on the rig delta (keeps markers "
                        "from flying off when the mesh underdetermines "
                        "them; default 1e-4)")
    d.add_argument("--subsample", type=int, default=20000,
                   help="cap on constraint vertices (random subset; "
                        "0 = use all)")
    d.add_argument("--max-iters", type=int, default=200,
                   help="gradient-path iteration budget "
                        "(multilayer/--tangent)")
    d.add_argument("--learning-rate", type=float, default=5e-2,
                   help="gradient-path Adam step size")
    d.add_argument("--seed", type=int, default=0,
                   help="subsample RNG seed")
    d.add_argument("--refit", metavar="PATH",
                   help="also deform the mesh with the recovered rig "
                        "(full forward cook), write it to PATH, and report "
                        "the max |refit - target| round-trip error")
    d.add_argument("--timing", action="store_true", help="print per-stage ms")


def _split_attr_names(spec):
    """'v,orient' -> ('v', 'orient'); None/empty -> None."""
    if not spec:
        return None
    return tuple(s for s in (p.strip() for p in spec.split(",")) if s)


def _chain_quat_sign(prev, q):
    """Quaternion sign-continuity chain: flip rows of q into prev's
    hemisphere (dot >= 0).  Each frame's polar quaternion canonicalizes
    w>=0 independently, so a vertex whose rotation crosses 180 degrees
    would flip hemisphere between frames and pop downstream
    slerp/motion blur; chaining against the previous frame removes the
    pop.  Shared by the batch and per-frame deform-seq paths."""
    dots = np.sum(q * prev, axis=1, keepdims=True)
    return np.where(dots < 0, -q, q).astype(np.float32)


def _select_transport_attrs(args, mesh):
    """The batch path's (names, kinds, values) for attribute transport —
    mirrors node.cook's selection (missing/untransportable attrs were
    already warned about by the frame-0 full cook).  N is dropped when
    --recompute-normals will win (faces present): the geometric rebuild
    overwrites it, so the Jacobian N transport would be wasted."""
    from facedeform_tpu.ops.jacobian import infer_attr_kind

    recompute_wins = bool(
        getattr(args, "recompute_normals", False)
        and mesh.faces is not None and len(mesh.faces)
    )
    names, kinds, vals = [], [], []
    if (args.update_normals and not recompute_wins
            and mesh.attr("N") is not None):
        names.append("N")
        kinds.append("normal")
        vals.append(mesh.attr("N"))
    for nm in _split_attr_names(args.transform_attrs) or ():
        if nm in names or (nm == "N" and recompute_wins):
            continue
        arr = mesh.attr(nm)
        kind = None if arr is None else infer_attr_kind(
            nm, arr, mesh.attr_typeinfo.get(nm)
        )
        if kind is None:
            continue
        names.append(nm)
        kinds.append(kind)
        vals.append(arr)
    return names, kinds, vals


def _cfg_params_from(args):
    from facedeform_tpu.config import (
        DeformConfig, DeformParams, PolyTerm, RBFKernel, RBFModelType,
    )

    cfg = DeformConfig(
        model=RBFModelType[args.model.upper()],
        kernel=RBFKernel[args.kernel.upper()],
        term=PolyTerm[args.term.upper()],
        layers=args.layers,
        tangent=args.tangent,
        morphspace=args.morphspace,
        dbse_robust=args.dbse_robust,
        doclampweight=args.clamp_weights,
        dofalloff=args.dofalloff,
        falloff_metric=args.falloff_metric,
        strict_parity=args.strict_parity,
        solver=args.solver,
    )
    params = DeformParams(
        qcoef=args.qcoef, zcoef=args.zcoef, radius=args.radius,
        lam=args.lam, falloffrate=args.falloff_rate,
        falloffradius=args.falloff_radius,
        weight_lo=args.weight_range[0], weight_hi=args.weight_range[1],
        maxedges=args.maxedges,
    )
    return cfg, params


def _print_load_warnings(paths, meshes) -> None:
    """Surface .geo-bridge skip notes (mesh.load_warnings) on stderr."""
    for path, m in zip(paths, meshes):
        for w in getattr(m, "load_warnings", []):
            print(f"warning: {path}: {w}", file=sys.stderr)


def _load_blends(paths):
    """--blend arguments -> (expanded_paths, meshes).

    A .glb that carries morph targets expands into one blendshape Mesh
    per target (rest + delta; geometry/gltf_io.load_glb_blendshapes), so
    an engine asset feeds the morphspace pass directly instead of being
    pre-split into per-shape files.  Every other input (OBJ/.geo/plain
    .glb) loads as one mesh, as before.
    """
    from facedeform_tpu.geometry import load_mesh

    out_paths, out_meshes = [], []
    for b in paths:
        if b.lower().endswith(".glb"):
            from facedeform_tpu.geometry.gltf_io import load_glb_blendshapes

            rest, shapes, names, _w = load_glb_blendshapes(b)
            if shapes:
                print(
                    f"info: {b}: expanded {len(shapes)} morph targets "
                    "as blendshapes", file=sys.stderr,
                )
                out_paths.extend(f"{b}#{n}" for n in names)
                out_meshes.extend(shapes)
            else:
                # no targets: the rest Mesh is already fully decoded —
                # re-parsing through load_mesh would double the GLB cost
                out_paths.append(b)
                out_meshes.append(rest)
            continue
        out_paths.append(b)
        out_meshes.append(load_mesh(b))
    return out_paths, out_meshes


def _maybe_autotune(args, cfg, params, rest_rig, deform_rig):
    """--autotune: LOOCV-select radius (and optionally ridge) from the rig
    pair before fitting.  Returns (params, error_message_or_None)."""
    if not getattr(args, "autotune", False):
        return params, None
    from facedeform_tpu.ops import loocv

    ridge = (
        loocv.DEFAULT_RIDGE_VALUES
        if getattr(args, "autotune_ridge", False) else None
    )
    try:
        params, diag = loocv.autotune(
            rest_rig.points, deform_rig.points, cfg, params,
            ridge_values=ridge,
        )
    except ValueError as e:
        return params, str(e)
    msg = (
        f"LOOCV autotune: radius factor {diag['best_factor']:g}"
        + (f", lambda {diag['best_ridge']:g}" if ridge is not None else "")
        + f" (LOO rms {diag['best_score']:.3e})"
    )
    print(f"info: {msg}", file=sys.stderr)
    return params, None


def _symmetrize_pose(args, rest_rig, deform_rig):
    """Mirror-close a single pose at CLI level (the deform-seq pattern).

    Returns symmetrized (rest_rig, deform_rig) Meshes with class /
    confidence carried through the closure.  Used when an external
    deformer (reduce-mode regress) skips the node's fit stage — the
    closure must land on the rigs BEFORE that fit reads them."""
    from facedeform_tpu.geometry.mesh import Mesh as _Mesh
    from facedeform_tpu.ops import symmetry as sym_ops

    r2, frames2, cls2, conf2, rep = sym_ops.symmetrize_frames(
        rest_rig.points, np.stack([deform_rig.points]),
        args.symmetrize, tol=args.symmetry_tol,
        classes=rest_rig.attr("class"),
        confidence=rest_rig.attr("confidence"),
    )
    rest_sym = _Mesh(points=r2)
    if cls2 is not None:
        rest_sym.set_attr("class", cls2)
    if conf2 is not None:
        rest_sym.set_attr("confidence", conf2)
    print(
        f"info: symmetrize: {rep.n_paired} paired, {rep.n_on_plane} "
        f"on-plane, {rep.n_appended} mirrored in (pair tol {rep.tol:.3g})",
        file=sys.stderr,
    )
    if rep.n_skipped:
        print(
            f"warning: symmetrize: {rep.n_skipped} marker(s) not "
            "mirrored in (near-duplicate control point); the "
            "deformation is not exactly symmetric around them.",
            file=sys.stderr,
        )
    return rest_sym, _Mesh(points=frames2[0])


def _apply_reduce_rig(args, rest_rig, rigs):
    """--reduce-rig: decimate the rest rig + every posed rig with ONE
    rest-only marker selection (ops/decimate.py; the selection is
    frame-independent).  Returns (rest_rig, rigs, error string | None)."""
    k = getattr(args, "reduce_rig", None)
    if not k:
        return rest_rig, rigs, None
    if k < 1:
        return rest_rig, rigs, "--reduce-rig K must be >= 1"
    n = rest_rig.num_points
    if any(r.num_points != n for r in rigs):
        return rest_rig, rigs, (
            f"--reduce-rig needs every posed rig to match the rest rig "
            f"({n} markers)"
        )
    if k >= n:
        print(
            f"warning: --reduce-rig {k} >= rig size {n}; keeping all markers",
            file=sys.stderr,
        )
        return rest_rig, rigs, None
    from facedeform_tpu.ops import decimate

    cfg, params = _cfg_params_from(args)
    idx, rep = decimate.reduce_rig(
        rest_rig.points, rigs[0].points, k, cfg, params
    )
    print(
        f"info: reduce-rig: {n} -> {len(idx)} markers; field error at the "
        f"{n - len(idx)} dropped markers max {rep.max_err:.3e} / rms "
        f"{rep.rms_err:.3e} (frame-0 motion scale {rep.motion_scale:.3e})",
        file=sys.stderr,
    )
    return rest_rig.subset(idx), [r.subset(idx) for r in rigs], None


def _cmd_deform(args) -> int:
    from facedeform_tpu.geometry import load_mesh, save_mesh
    from facedeform_tpu.geometry.topology import compute_tangent_frame
    from facedeform_tpu.node import FaceDeformNode
    from facedeform_tpu.utils.profiling import StageTimes, stage

    times = StageTimes()
    with stage("load", times):
        # extension dispatch: Houdini .geo/.hgeo or OBJ, per input
        mesh = load_mesh(args.mesh)
        rest_rig = load_mesh(args.rest_rig)
        deform_rig = load_mesh(args.deform_rig)
        blend_paths, blends = _load_blends(args.blend)
        examples = [
            (load_mesh(p), load_mesh(s)) for p, s in args.example
        ]
        sec_meshes = [load_mesh(p) for p, _ in args.secondary]
    ex_paths = [p for pair in args.example for p in pair]
    ex_meshes = [m for pair in examples for m in pair]
    _print_load_warnings(
        [args.mesh, args.rest_rig, args.deform_rig]
        + blend_paths + ex_paths + [p for p, _ in args.secondary],
        [mesh, rest_rig, deform_rig] + blends + ex_meshes + sec_meshes,
    )
    psd_loaded, psd_err = _load_psd_arg(args, bool(examples))
    if psd_err:
        print(f"error: {psd_err}", file=sys.stderr)
        return 1
    if getattr(args, "reduce_mode", "subset") == "subset":
        rest_rig, _drigs, red_err = _apply_reduce_rig(
            args, rest_rig, [deform_rig]
        )
        if red_err:
            print(f"error: {red_err}", file=sys.stderr)
            return 1
        deform_rig = _drigs[0]
    elif not getattr(args, "reduce_rig", None):
        print("error: --reduce-mode regress requires --reduce-rig K",
              file=sys.stderr)
        return 1

    cfg, params = _cfg_params_from(args)
    if getattr(args, "load_deformer", None):
        if args.autotune:
            print(
                "warning: --autotune is ignored with --load-deformer "
                "(the checkpoint's solve is reused, no fit happens)",
                file=sys.stderr,
            )
    else:
        params, tune_err = _maybe_autotune(
            args, cfg, params, rest_rig, deform_rig
        )
        if tune_err:
            print(f"error: {tune_err}", file=sys.stderr)
            return 1
    if cfg.tangent and not mesh.has_tangent_frame():
        with stage("tangent_frame", times):
            compute_tangent_frame(mesh)

    ext_deformer = None
    if getattr(args, "load_deformer", None):
        # resume a checkpointed solve: the cook skips the fit; solve-model
        # flags come from the checkpoint (node merges them), CLI eval
        # flags (--tangent/--falloff/--group/--picked/...) still apply
        import dataclasses as _dc

        from facedeform_tpu.utils import checkpoint

        k = checkpoint.kind(args.load_deformer)
        with stage("load_deformer", times):
            if k == "dense":
                ext_deformer = checkpoint.load(args.load_deformer)
            elif k == "pu":
                from facedeform_tpu.ops.pu import PUNodeDeformer

                ext_deformer = PUNodeDeformer(
                    pud=checkpoint.load_pu(args.load_deformer),
                    cfg=_dc.replace(cfg, solver="pu"), params=params,
                )
            else:
                print(
                    f"error: {args.load_deformer} is a {k} (sequence) "
                    "checkpoint — sequences serve deform-seq/serve, "
                    "not deform", file=sys.stderr,
                )
                return 1

    pre_symmetrized = False   # regress mode mirror-closes at CLI level
    if (getattr(args, "reduce_rig", None)
            and getattr(args, "reduce_mode", "subset") == "regress"):
        # reduced-basis regression: ALL markers constrain K centers
        # (decimate.fit_reduced); the result is a stock Deformer handed to
        # the cook's external-deformer path, so eval/falloff/tangent
        # compose unchanged
        if ext_deformer is not None:
            print(
                "error: --reduce-mode regress conflicts with "
                "--load-deformer (both supply the solve)",
                file=sys.stderr,
            )
            return 1
        if cfg.solver == "pu":
            print(
                "error: --reduce-mode regress conflicts with --solver pu "
                "(both replace the dense route; the K-center regression "
                "model is already any-N)", file=sys.stderr,
            )
            return 1
        if args.reduce_rig >= rest_rig.num_points:
            print(
                f"warning: --reduce-rig {args.reduce_rig} >= rig size "
                f"{rest_rig.num_points}; fitting the full rig",
                file=sys.stderr,
            )
        else:
            from facedeform_tpu.deformer import Deformer as _Dfm
            from facedeform_tpu.ops import decimate
            from facedeform_tpu.utils import errors as err_mod

            if args.symmetrize:
                # the regress fit reads the rigs directly, so the mirror
                # closure must land BEFORE it (the node's symmetrize only
                # covers the fit stage this external deformer skips);
                # same pairing pass as the deform-seq path
                rest_rig, deform_rig = _symmetrize_pose(
                    args, rest_rig, deform_rig
                )
                pre_symmetrized = True
            try:
                with stage("reduce_fit", times):
                    r_model, r_report, r_info = decimate.fit_reduced(
                        rest_rig.points, deform_rig.points,
                        int(args.reduce_rig), cfg, params,
                        confidence=rest_rig.attr("confidence"),
                    )
                err_mod.check_solve(r_report)
            except (ValueError, err_mod.SolveFailedError) as e:
                print(f"error: --reduce-mode regress: {e}", file=sys.stderr)
                return 1
            print(
                f"info: reduce-rig (regress): {rest_rig.num_points} "
                f"markers -> {len(r_info.idx)} centers; fit residual at "
                f"all markers max {r_info.fit_max:.3e} / rms "
                f"{r_info.fit_rms:.3e} (motion scale "
                f"{r_info.motion_scale:.3e})",
                file=sys.stderr,
            )
            ext_deformer = _Dfm(
                model=r_model, cfg=cfg, params=params, report=r_report,
                reduced=True,
            )

    node = FaceDeformNode()
    with stage("cook", times):
        res = node.cook(
            [mesh, rest_rig, deform_rig] + blends, cfg, params,
            group=args.group, picked=args.picked, deformer=ext_deformer,
            update_normals=args.update_normals,
            transform_attrs=_split_attr_names(args.transform_attrs),
            output_stretch=args.output_stretch,
            recompute_normals=args.recompute_normals,
            symmetrize=None if pre_symmetrized else args.symmetrize,
            symmetry_tol=args.symmetry_tol,
            examples=examples, psd_lam=args.psd_lambda,
            psd_eps=args.psd_eps, psd_normalize=args.psd_normalize,
            psd_align=args.psd_align, psd=psd_loaded,
            secondary=sec_meshes,
        )
    for w in res.warnings:
        print(f"warning: {w}", file=sys.stderr)
    for m in res.messages:
        print(f"info: {m}", file=sys.stderr)

    with stage("save", times):
        save_mesh(args.output, res.mesh)
        for (_, sec_out), sm in zip(args.secondary, res.secondary):
            save_mesh(sec_out, sm)
            print(
                f"wrote {sec_out} ({sm.num_points} points, secondary)",
                file=sys.stderr,
            )
    if args.save_deformer:
        _save_deformer(node, args.save_deformer)
    if args.save_psd:
        rc = _save_psd_state(node, args.save_psd)
        if rc:
            return rc
    if args.timing:
        print(f"timing: {times.summary()}", file=sys.stderr)
    print(f"wrote {args.output} ({res.mesh.num_points} points)")
    return 0


def _load_psd_arg(args, have_examples: bool):
    """(PSDDeformer | None, error string | None) for --load-psd."""
    path = getattr(args, "load_psd", None)
    if not path:
        return None, None
    if have_examples:
        print(
            "warning: --load-psd is ignored with --example (the examples "
            "refit the pose-space model)", file=sys.stderr,
        )
        return None, None
    from facedeform_tpu.utils import checkpoint

    try:
        return checkpoint.load_psd(path), None
    except (OSError, ValueError) as e:
        return None, f"--load-psd: {e}"


def _save_psd_state(node, path: str) -> int:
    """Checkpoint the cook's fitted pose-space model; 0 on success."""
    from facedeform_tpu.utils import checkpoint

    psd, _ = node.psd_state()
    if psd is None:
        print(
            "error: --save-psd: no pose-space model was fitted (pass "
            "--example pairs; a failed fit reports its own warning)",
            file=sys.stderr,
        )
        return 1
    checkpoint.save_psd(path, psd)
    print(f"checkpointed the pose-space model to {path}", file=sys.stderr)
    return 0


def _save_deformer(node, path: str) -> None:
    from facedeform_tpu.deformer import Deformer
    from facedeform_tpu.utils import checkpoint

    if isinstance(node._deformer, Deformer):
        checkpoint.save(path, node._deformer)
    else:
        # PU adapter: persist the underlying PU model
        checkpoint.save_pu(path, node._deformer.pud)


def _cmd_deform_seq(args) -> int:
    """Animated sequence: one cook per posed rig through a single node.

    The node's data-id caches make the loop the per-frame step the
    reference pays inside Houdini's animation: capture, DBSE setup, the
    Z-order permutation and the dense-vs-culled autotune all hit after
    frame 1; only the (rig-dependent) solve + eval re-run, on cached jit
    programs.  For the collective-solve variant see
    parallel.batched.fit_frames/apply_frames (docs/API.md, Scaling).
    """
    import os

    from facedeform_tpu.geometry import load_mesh, save_mesh
    from facedeform_tpu.geometry.topology import compute_tangent_frame
    from facedeform_tpu.node import FaceDeformNode
    from facedeform_tpu.utils.profiling import StageTimes, stage

    if getattr(args, "load_deformer", None):
        print(
            "warning: deform-seq solves per posed rig; --load-deformer "
            "is ignored (it resumes a single-pose solve via `deform`)",
            file=sys.stderr,
        )
    # argparse-level validation BEFORE the (possibly huge) geometry load:
    # a typo must not cost minutes of shot I/O
    if (getattr(args, "save_shapes", None)
            and getattr(args, "gltf_rank", None) is None):
        print("error: --save-shapes requires --gltf-rank", file=sys.stderr)
        return 1
    if (getattr(args, "gltf_rank", None) is not None
            and not (getattr(args, "gltf", None)
                     or getattr(args, "save_shapes", None))):
        print("error: --gltf-rank needs --gltf and/or --save-shapes",
              file=sys.stderr)
        return 1
    try:
        if args.out_pattern % 0 == args.out_pattern:
            raise ValueError("no frame index substituted")
    except (TypeError, ValueError) as e:
        print(
            f"error: --out-pattern must contain exactly one integer "
            f"format field (e.g. frame_%04d.geo): {e}",
            file=sys.stderr,
        )
        return 1
    for _, sec_pat in args.secondary:
        try:
            if sec_pat % 0 == sec_pat:
                raise ValueError("no frame index substituted")
        except (TypeError, ValueError) as e:
            print(
                f"error: --secondary PATTERN must contain exactly one "
                f"integer format field (e.g. teeth_%04d.obj): {e}",
                file=sys.stderr,
            )
            return 1
    times = StageTimes()
    with stage("load", times):
        mesh = load_mesh(args.mesh)
        rest_rig = load_mesh(args.rest_rig)
        rigs = [load_mesh(p) for p in args.deform_rigs]
        blend_paths, blends = _load_blends(args.blend)
        examples = [
            (load_mesh(p), load_mesh(s)) for p, s in args.example
        ]
        sec_meshes = [load_mesh(p) for p, _ in args.secondary]
    _print_load_warnings(
        [args.mesh, args.rest_rig] + list(args.deform_rigs)
        + blend_paths + [p for pair in args.example for p in pair]
        + [p for p, _ in args.secondary],
        [mesh, rest_rig] + rigs + blends
        + [m for pair in examples for m in pair] + sec_meshes,
    )
    psd_loaded, psd_err = _load_psd_arg(args, bool(examples))
    if psd_err:
        print(f"error: {psd_err}", file=sys.stderr)
        return 1
    seq_regress = getattr(args, "reduce_mode", "subset") == "regress"
    if not seq_regress:
        rest_rig, rigs, red_err = _apply_reduce_rig(args, rest_rig, rigs)
        if red_err:
            print(f"error: {red_err}", file=sys.stderr)
            return 1
    elif not getattr(args, "reduce_rig", None):
        print("error: --reduce-mode regress requires --reduce-rig K",
              file=sys.stderr)
        return 1

    needs_uniform = (getattr(args, "temporal_smooth", None)
                     or getattr(args, "symmetrize", None)
                     or seq_regress)
    if needs_uniform and rigs:
        # both whole-shot transforms stack the rigs; validate once
        n0 = rest_rig.num_points
        bad = [p for p, r in zip(args.deform_rigs, rigs)
               if r.num_points != n0]
        if bad:
            print(
                "error: rig point counts differ from the rest rig: "
                f"{', '.join(bad)}", file=sys.stderr,
            )
            return 1

    if getattr(args, "temporal_smooth", None) and len(rigs) > 1:
        # Denoise the RAW tracker data first; symmetry/fit see the
        # filtered trajectories (ops/temporal.py — solver-agnostic).
        from facedeform_tpu.ops import temporal

        stack = np.stack([r.points for r in rigs])
        sm = temporal.smooth_frames(
            stack, window=args.temporal_smooth, order=args.temporal_order
        )
        removed = np.linalg.norm(sm - stack, axis=-1)
        new_rigs = []
        for r, p in zip(rigs, sm):
            r2 = r.copy()
            r2.set_points(p)
            new_rigs.append(r2)
        rigs = new_rigs
        print(
            f"info: temporal smooth (window {args.temporal_smooth}, "
            f"order {args.temporal_order}): removed jitter rms "
            f"{float(np.sqrt((removed ** 2).mean())):.3g}, "
            f"max {float(removed.max()):.3g}",
            file=sys.stderr,
        )

    if getattr(args, "symmetrize", None) and rigs:
        # Pre-symmetrize the whole shot at load time (ops/symmetry.py):
        # the pairing depends only on the rest rig, so every frame shares
        # one symmetrized rest rig and both the batch fit and the
        # per-frame cooks see consistent marker counts.
        from facedeform_tpu.geometry.mesh import Mesh as _Mesh
        from facedeform_tpu.ops import symmetry as sym_ops

        # (point counts validated once above, shared with temporal-smooth)
        # one pairing pass for the whole shot (the pairing and rest snap
        # depend only on the rest rig); `class` and `confidence` attrs
        # ride through so capture islands and the weighted ridge survive
        # example poses (pose-space deformation) ride the SAME pairing
        # pass as the shot — once the rig is closed under the mirror,
        # an unsymmetrized example pose no longer matches its point count
        ex_ok = [i for i, (p, _) in enumerate(examples)
                 if p.num_points == rest_rig.num_points]
        if len(ex_ok) < len(examples):
            print(
                f"warning: psd: {len(examples) - len(ex_ok)} example "
                "pose(s) don't match the rig point count; dropped before "
                "symmetrize.", file=sys.stderr,
            )
            examples = [examples[i] for i in ex_ok]
        n_shot = len(rigs)
        r2, frames2, cls2, conf2, rep = sym_ops.symmetrize_frames(
            rest_rig.points,
            np.stack([r.points for r in rigs]
                     + [p.points for p, _ in examples]),
            args.symmetrize, tol=args.symmetry_tol,
            classes=rest_rig.attr("class"),
            confidence=rest_rig.attr("confidence"),
        )
        if examples:
            examples = [
                (_Mesh(points=f), s)
                for f, (_, s) in zip(frames2[n_shot:], examples)
            ]
            frames2 = frames2[:n_shot]
        rest_sym = _Mesh(points=r2)
        if cls2 is not None:
            rest_sym.set_attr("class", cls2)
        if conf2 is not None:
            rest_sym.set_attr("confidence", conf2)
        rest_rig = rest_sym
        rigs = [_Mesh(points=f) for f in frames2]
        print(
            f"info: symmetrize: {rep.n_paired} paired, "
            f"{rep.n_on_plane} on-plane, {rep.n_appended} mirrored in; "
            f"worst frame asymmetry {rep.max_asymmetry:.3g} "
            f"(pair tol {rep.tol:.3g})",
            file=sys.stderr,
        )
        if rep.n_skipped:
            print(
                f"warning: symmetrize: {rep.n_skipped} marker(s) not "
                "mirrored in (near-duplicate control point); the "
                "deformation is not exactly symmetric around them.",
                file=sys.stderr,
            )

    cfg, params = _cfg_params_from(args)
    if rigs:
        # tune on the first posed frame; the chosen radius field depends
        # only on the rest rig, so it serves the whole shot
        params, tune_err = _maybe_autotune(args, cfg, params, rest_rig, rigs[0])
        if tune_err:
            print(f"error: {tune_err}", file=sys.stderr)
            return 1
    if cfg.tangent and not mesh.has_tangent_frame():
        with stage("tangent_frame", times):
            compute_tangent_frame(mesh)

    # --reduce-mode regress: fit the WHOLE shot's reduced-basis regression
    # once (decimate.fit_reduced_frames — the design matrix depends only
    # on the rest rig, frames are RHS columns of one factorization), then
    # hand per-frame Deformer slices to the cooks / the batched eval.
    red_seq = None          # (full-shot batched RBFModel, report, info)
    if seq_regress and rigs:
        if cfg.solver == "pu":
            print(
                "error: --reduce-mode regress conflicts with --solver pu "
                "(both replace the dense route; the K-center regression "
                "model is already any-N)", file=sys.stderr,
            )
            return 1
        if args.reduce_rig >= rest_rig.num_points:
            print(
                f"warning: --reduce-rig {args.reduce_rig} >= rig size "
                f"{rest_rig.num_points}; fitting the full rig",
                file=sys.stderr,
            )
            seq_regress = False
        else:
            from facedeform_tpu.ops import decimate
            from facedeform_tpu.utils import errors as err_mod

            try:
                with stage("reduce_fit", times):
                    r_model, r_report, r_info = decimate.fit_reduced_frames(
                        rest_rig.points,
                        np.stack([r.points for r in rigs]).astype(np.float32),
                        int(args.reduce_rig), cfg, params,
                        confidence=rest_rig.attr("confidence"),
                    )
                err_mod.check_solve(r_report)
            except (ValueError, err_mod.SolveFailedError) as e:
                print(f"error: --reduce-mode regress: {e}", file=sys.stderr)
                return 1
            print(
                f"info: reduce-rig (regress): {rest_rig.num_points} "
                f"markers -> {len(r_info.idx)} centers, one shared "
                f"factorization for {len(rigs)} frame(s); worst-frame fit "
                f"residual at all markers max {r_info.fit_max.max():.3e} "
                f"/ rms {r_info.fit_rms.max():.3e} (motion scale "
                f"{r_info.motion_scale:.3e})",
                file=sys.stderr,
            )
            red_seq = (r_model, r_report, r_info)

    def _red_frame_deformer(f):
        """Single-frame Deformer slice of the shot's regression model."""
        from facedeform_tpu.deformer import Deformer as _Dfm
        from facedeform_tpu.parallel.batched import _frame_model

        r_model, r_report, _ = red_seq
        return _Dfm(model=_frame_model(r_model, f), cfg=cfg, params=params,
                    report=r_report, reduced=True)

    os.makedirs(args.outdir, exist_ok=True)
    node = FaceDeformNode()
    warned: set = set()
    # --gltf / --save-shapes collect every frame's deformed positions for
    # the morph-target export (flags validated before the load stage);
    # None keeps long per-frame shots O(1) memory
    want_frames = getattr(args, "gltf", None) or getattr(args, "save_shapes", None)
    glb_frames = [] if want_frames else None

    use_batch = bool(getattr(args, "batch", False))
    if use_batch:
        from facedeform_tpu.ops import fit as fit_mod

        n = rest_rig.num_points
        blockers = []
        if args.picked:
            blockers.append("picked")
        if cfg.solver == "pu" or red_seq is not None:
            pass  # any-N batch routes: ops/pu.fit_pu_frames shares one
            #       patch factorization across every frame; the reduced
            #       regression model is K-center dense regardless of N
        elif cfg.solver == "krylov" or fit_mod.uses_krylov(cfg, n):
            blockers.append("krylov-size rig")
        if any(r.num_points != n for r in rigs):
            blockers.append("rig point counts differ across frames")
        # Selection-based, not flag-based: --update-normals superseded by
        # --recompute-normals (or naming only missing attrs) must not
        # force the unfused fit+apply path nor a wasted Jacobian pass.
        sel_names, sel_kinds, sel_vals = _select_transport_attrs(args, mesh)
        transport_requested = bool(sel_names or args.output_stretch)
        if blockers:
            print(
                "warning: --batch falls back to per-frame cooks "
                f"({', '.join(blockers)})", file=sys.stderr,
            )
            use_batch = False

    seq_ckpt = None
    t0 = time.time()
    if use_batch:
        # Frame 0 through the FULL node (capture, falloff, group pattern,
        # autotune) — its fd_falloff is the composed falloff x group gate,
        # which is frame-invariant (it depends on capture distances and
        # the mask, not the posed rig).  Frames 1+ then reduce to
        # P + disp_f * gate: one dispatch for all remaining solves+evals
        # (parallel.batched.deform_frames, MXU frames kernel on TPU).
        import jax.numpy as jnp

        from facedeform_tpu.parallel import batched

        with stage("cook[0]", times):
            res0 = node.cook(
                [mesh, rest_rig, rigs[0]] + blends, cfg, params,
                group=args.group, picked=args.picked,
                deformer=_red_frame_deformer(0) if red_seq else None,
                update_normals=args.update_normals,
                transform_attrs=_split_attr_names(args.transform_attrs),
                output_stretch=args.output_stretch,
                recompute_normals=args.recompute_normals,
                examples=examples, psd_lam=args.psd_lambda,
                psd_eps=args.psd_eps, psd_normalize=args.psd_normalize,
                psd_align=args.psd_align, psd=psd_loaded,
                secondary=sec_meshes,
            )
        for w in res0.warnings:
            if w not in warned:
                warned.add(w)
                print(f"warning: {w}", file=sys.stderr)
        for (_, sec_pat), sm in zip(args.secondary, res0.secondary):
            with stage("save", times):
                save_mesh(os.path.join(args.outdir, sec_pat % 0), sm)
        vel_fps = args.out_velocity
        path0 = os.path.join(args.outdir, args.out_pattern % 0)
        if vel_fps is None:
            # velocity needs frame 1's positions first; defer the write
            with stage("save", times):
                save_mesh(path0, res0.mesh)
        sec_frames_all: list = []   # per secondary: (F', Vs, 3) frames 1+
        if len(rigs) > 1:
            gate = np.asarray(
                res0.mesh.point_attrs["fd_falloff"], np.float32
            )
            frames_arr = None
            if red_seq is None:
                # the regress route's model is already fitted on the
                # whole shot; only the fit-here branches stack the rigs
                frames_arr = np.stack(
                    [r.points for r in rigs[1:]]
                ).astype(np.float32)
            # frames 1+ solve with the same per-marker confidence the
            # frame-0 node cook consumed (rest-rig `confidence` attr);
            # the cook already warned where the attr is inapplicable
            # (QNN keeps lam=0 on every route, so confidence is a no-op)
            from facedeform_tpu.config import RBFModelType

            rig_confidence = rest_rig.attr("confidence")
            if rig_confidence is not None and cfg.model == RBFModelType.QNN:
                rig_confidence = None
            frame = None
            if cfg.tangent and mesh.has_tangent_frame():
                frame = tuple(
                    mesh.point_attrs[k] for k in ("tangentu", "tangentv", "N")
                )
            # --save-deformer on the batch path checkpoints the WHOLE
            # shot (save_seq/save_pu_seq), so the fit must cover frame 0
            # too; output for frame 0 still comes from the full node cook.
            fit_all = bool(args.save_deformer)
            if fit_all and red_seq is None:
                frames_arr = np.stack(
                    [r.points for r in rigs]
                ).astype(np.float32)
            with stage("batch[1:]", times):
                if red_seq is not None:
                    # reduced regression: the shot's model is already
                    # fitted (one shared factorization over all frames);
                    # slice to the frames this dispatch covers and eval.
                    from facedeform_tpu.ops.fit import RBFModel as _RBFM

                    r_model, _r_rep, r_info = red_seq
                    model_all = r_model if fit_all else _RBFM(
                        ctrl=r_model.ctrl, w_rbf=r_model.w_rbf[1:],
                        w_poly=r_model.w_poly[1:], eps=r_model.eps,
                    )
                    out_frames, _ = batched.apply_frames(
                        model_all, jnp.asarray(mesh.points),
                        jnp.zeros(mesh.num_points, jnp.float32),
                        jnp.asarray(gate), cfg, params, None, frame,
                    )
                    if fit_all:
                        # the full-shot model (frame 0 included) is a
                        # stock frames-stacked RBFModel: save_seq serves
                        # apply_seq/deform-seq resume unchanged
                        seq_ckpt = ("seq", (r_model, r_info.resid_norms))
                elif cfg.solver == "pu":
                    # any-N route: one patch factorization for all frames
                    # (ops/pu.fit_pu_frames), one shared eval plan
                    from facedeform_tpu.ops.pu import (
                        PUSeqDeformer, node_fit_kwargs,
                    )
                    from facedeform_tpu.utils import errors

                    seq = PUSeqDeformer.fit(
                        rest_rig.points, frames_arr,
                        **node_fit_kwargs(cfg, params),
                        confidence=rig_confidence,
                    )
                    errors.check_solve(seq.report)
                    # dist2=None -> falloff 1; the composed falloff x
                    # group gate from frame 0 rides in via `gate`
                    out_frames, _ = seq.apply_seq(
                        mesh.points, gate=gate, cfg=cfg, params=params,
                        frame=frame,
                    )
                    if fit_all:
                        seq_ckpt = ("pu_seq", seq)
                elif fit_all or transport_requested or sec_meshes:
                    # fit_frames + apply_frames instead of the fused
                    # deform_frames: the checkpoint, the batched
                    # attribute transport and/or the secondary-mesh
                    # evals need the model stack
                    from facedeform_tpu.utils import errors

                    model_all, resid = batched.fit_frames(
                        jnp.asarray(rest_rig.points),
                        jnp.asarray(frames_arr), cfg, params,
                        confidence=rig_confidence,
                    )
                    errors.check_frames(resid, rest_rig.points, frames_arr)
                    out_frames, _ = batched.apply_frames(
                        model_all, jnp.asarray(mesh.points),
                        jnp.zeros(mesh.num_points, jnp.float32),
                        jnp.asarray(gate), cfg, params, None, frame,
                    )
                    if fit_all:
                        seq_ckpt = ("seq", (model_all, np.asarray(resid)))
                else:
                    out_frames, _ = batched.deform_frames(
                        jnp.asarray(rest_rig.points), jnp.asarray(frames_arr),
                        jnp.asarray(mesh.points),
                        jnp.zeros(mesh.num_points, jnp.float32),
                        jnp.asarray(gate), cfg, params, frame=frame,
                        confidence=rig_confidence,
                    )
                    # the fused one-dispatch program discards residuals;
                    # a blown-up solve surfaces as non-finite positions
                    if not bool(jnp.all(jnp.isfinite(out_frames))):
                        from facedeform_tpu.utils.errors import (
                            SolveFailedError,
                        )

                        raise SolveFailedError(
                            "sequence solve produced non-finite positions "
                            "— singular or ill-conditioned rig (duplicate "
                            "markers?)"
                        )
                # ---- secondary accessory meshes: driven by the SAME
                # batched solves, full displacement (no capture gate —
                # node.cook(secondary=...) semantics), one dispatch each;
                # morph/psd below are main-mesh passes and skip these
                for sm in sec_meshes:
                    s_frame = None
                    if cfg.tangent and sm.has_tangent_frame():
                        s_frame = tuple(
                            sm.point_attrs[k]
                            for k in ("tangentu", "tangentv", "N")
                        )
                    if cfg.solver == "pu":
                        s_out, _ = seq.apply_seq(
                            sm.points, cfg=cfg, params=params,
                            frame=s_frame,
                        )
                    else:
                        s_out, _ = batched.apply_frames(
                            model_all, jnp.asarray(sm.points),
                            jnp.zeros(sm.num_points, jnp.float32),
                            jnp.ones(sm.num_points, jnp.float32),
                            cfg, params, None, s_frame,
                        )
                    sec_frames_all.append(np.asarray(s_out, np.float32))
                # ---- batched morph pass (DBSE): all remaining frames in
                # ONE vmapped weight solve + reconstruction einsum, off
                # the blend basis cached by frame 0's cook (the basis is
                # frame-invariant: it depends on rest + blends only)
                seq_weights = None     # per-frame (S,) weights, aligned
                seq_w_ok = None        # with out_frames rows
                if cfg.morphspace:
                    dbse_model, rest_attr = node.dbse_state()
                    if dbse_model is not None:
                        from facedeform_tpu.ops import dbse as dbse_ops
                        from facedeform_tpu.utils import errors as err_mod

                        rest_j = jnp.asarray(rest_attr)
                        cur = jnp.asarray(out_frames)
                        if cfg.dbse_lstsq:
                            _w_batched = (
                                dbse_ops.weights_robust_batched
                                if cfg.dbse_robust
                                else dbse_ops.weights_lstsq_batched
                            )
                            w_f, w_rep = _w_batched(
                                dbse_model, cur, rest_j
                            )
                            ok = err_mod.frames_solve_ok(w_rep)
                            seq_weights = np.asarray(w_f)
                        else:
                            w_f = dbse_ops.weights_parity_batched(
                                dbse_model, cur, rest_j
                            )
                            seq_weights = np.asarray(w_f)
                            ok = np.isfinite(seq_weights).all(axis=1)
                        morphed = dbse_ops.morph_apply(
                            dbse_model, cur, rest_j, w_f, cfg, params
                        )
                        if not ok.all():
                            # per-frame skip, matching the node's
                            # warn-and-ignore on a failed weight solve
                            morphed = jnp.where(
                                jnp.asarray(ok)[:, None, None],
                                morphed, cur,
                            )
                            # with fit_all, row 0 is discarded (the
                            # written frame 0 is the node cook's output,
                            # which ran its own check) — don't warn on it
                            bad = [
                                str(i if fit_all else i + 1)
                                for i in np.flatnonzero(~ok)
                                if not (fit_all and i == 0)
                            ]
                            if bad:
                                print(
                                    "warning: Can't compute weights for "
                                    "morphspace deformation. Ignoring it. "
                                    f"(frames {', '.join(bad)})",
                                    file=sys.stderr,
                                )
                        out_frames = morphed
                        seq_w_ok = ok
                out_frames = np.asarray(out_frames)
                seq_transport = None
                if transport_requested:
                    # Per-frame attribute transport for frames 1+; frame 0
                    # was transported by the full node cook above.
                    t_names, t_kinds, t_vals = sel_names, sel_kinds, sel_vals
                    want_sig = bool(args.output_stretch)
                    if (t_names or want_sig) and cfg.solver != "pu":
                        # global families: ONE dispatch for the shot
                        t_outs = batched.transport_frames(
                            model_all, jnp.asarray(mesh.points),
                            tuple(jnp.asarray(v0, jnp.float32)
                                  for v0 in t_vals),
                            jnp.asarray(gate), cfg, tuple(t_kinds),
                            frame=frame, want_stretch=want_sig,
                        )
                        t_outs = [np.asarray(t, np.float32) for t in t_outs]
                    elif t_names or want_sig:
                        # PU: per-frame Jacobian off the SHARED patch
                        # factorization and eval plan — no refits
                        from facedeform_tpu.ops import jacobian as jac_ops

                        rules = {
                            "vector": jac_ops.transform_vectors,
                            "normal": jac_ops.transform_normals,
                            "quaternion": jac_ops.transform_quaternions,
                        }
                        per_frame = []
                        for pud_f in seq.puds:
                            jac = pud_f.jacobian(mesh.points)
                            fgrad = jac_ops._applied_gradient(
                                jac, jnp.asarray(gate, jnp.float32),
                                cfg, frame,
                            )
                            outs = [
                                np.asarray(rules[k](
                                    jnp.asarray(v0, jnp.float32), fgrad
                                ), np.float32)
                                for v0, k in zip(t_vals, t_kinds)
                            ]
                            if want_sig:
                                outs.append(np.asarray(
                                    jac_ops.principal_stretches(fgrad),
                                    np.float32,
                                ))
                            per_frame.append(outs)
                        t_outs = [
                            np.stack([fr[i] for fr in per_frame])
                            for i in range(len(per_frame[0]))
                        ]
                    else:
                        t_outs = None
                    if t_outs is not None:
                        if fit_all:
                            # model stack covered frame 0; drop it here
                            t_outs = [t[1:] for t in t_outs]
                        # Chain quaternion signs from frame 0's
                        # transported attr through the shot (same rule
                        # as the per-frame path: _chain_quat_sign).
                        for i, k in enumerate(t_kinds):
                            if k != "quaternion":
                                continue
                            prev = res0.mesh.attr(t_names[i])
                            fixed = []
                            for fi in range(t_outs[i].shape[0]):
                                q = _chain_quat_sign(prev, t_outs[i][fi])
                                fixed.append(q)
                                prev = q
                            t_outs[i] = np.stack(fixed)
                        seq_transport = (t_names, t_outs)
                if fit_all:
                    # frames_arr covered frame 0 for the checkpoint; the
                    # written frame 0 stays the full node cook's output
                    out_frames = out_frames[1:]
                    if seq_weights is not None:
                        seq_weights = seq_weights[1:]
                        seq_w_ok = seq_w_ok[1:]
                    sec_frames_all = [s[1:] for s in sec_frames_all]
                # ---- pose-space correction (psd) for frames 1+: ONE
                # weights dispatch for the whole shot (K scalars/frame
                # through the tunnel) + a host contraction against the
                # corrections frame 0's full node cook fitted/validated —
                # same order as the node (after the morph pass).
                psd_m, psd_corr = node.psd_state()
                if (examples or psd_loaded is not None) and psd_m is not None:
                    from facedeform_tpu.ops import psd as psd_ops

                    fr = [
                        psd_ops.pose_feature(
                            rest_rig.points, r.points, psd_m.align
                        )
                        for r in rigs[1:]
                    ]
                    feats = np.stack([f for f, _ in fr])
                    w_psd = np.asarray(psd_ops.psd_weights(
                        psd_m.model, feats, psd_m.kernel, psd_m.normalize
                    ), np.float32)
                    delta = np.tensordot(
                        w_psd, psd_corr, axes=1
                    ).astype(np.float32)
                    if psd_m.align:
                        # rest-frame corrections rotate out by each
                        # frame's own rigid pose: delta_f @ r_f.T
                        rots = np.stack([r for _, r in fr])
                        delta = np.einsum(
                            "fvc,fdc->fvd", delta, rots
                        ).astype(np.float32)
                    out_frames = out_frames + delta
            if vel_fps is not None:
                # Trail-SOP semantics: backward difference of the DEFORMED
                # positions; frame 0 forward so every frame has motion
                res0.mesh.set_attr("v", ((
                    out_frames[0] - res0.mesh.points) * vel_fps
                ).astype(np.float32))
                with stage("save", times):
                    save_mesh(path0, res0.mesh)
            for f in range(1, len(rigs)):
                fm = res0.mesh.copy()
                fm.points = np.ascontiguousarray(
                    out_frames[f - 1], np.float32
                )
                if seq_weights is not None:
                    # this frame's DBSE weights (frame 0's, inherited via
                    # the mesh copy, would be stale); a failed per-frame
                    # solve drops the attr, matching the node's ignore
                    if seq_w_ok[f - 1]:
                        fm.detail_attrs["weights"] = seq_weights[f - 1]
                    else:
                        fm.detail_attrs.pop("weights", None)
                if seq_transport is not None:
                    t_names, t_outs = seq_transport
                    for i, nm in enumerate(t_names):
                        fm.set_attr(nm, t_outs[i][f - 1])
                    if args.output_stretch:
                        sig = t_outs[len(t_names)][f - 1]
                        fm.set_attr("fd_stretch", sig[:, 0])
                        fm.set_attr("fd_compress", sig[:, 2])
                if (args.recompute_normals and fm.faces is not None
                        and len(fm.faces)):
                    # geometric N of THIS frame's surface (wins over the
                    # analytic transport, matching node precedence)
                    from facedeform_tpu.geometry.topology import (
                        vertex_normals,
                    )

                    fm.set_attr("N", vertex_normals(fm))
                if vel_fps is not None:
                    prev = (res0.mesh.points if f == 1
                            else out_frames[f - 2])
                    fm.set_attr("v", ((
                        out_frames[f - 1] - prev) * vel_fps
                    ).astype(np.float32))
                with stage("save", times):
                    save_mesh(
                        os.path.join(args.outdir, args.out_pattern % f), fm
                    )
            for si, (_, sec_pat) in enumerate(args.secondary):
                sm0 = res0.secondary[si]
                s_frames = sec_frames_all[si]
                for f in range(1, len(rigs)):
                    sfm = sm0.copy()
                    sfm.set_points(
                        np.ascontiguousarray(s_frames[f - 1], np.float32)
                    )
                    if (args.recompute_normals and sfm.faces is not None
                            and len(sfm.faces)):
                        from facedeform_tpu.geometry.topology import (
                            vertex_normals,
                        )

                        sfm.set_attr("N", vertex_normals(sfm))
                    with stage("save", times):
                        save_mesh(
                            os.path.join(args.outdir, sec_pat % f), sfm
                        )
        elif vel_fps is not None:
            # single-frame "sequence": zero velocity, still write the attr
            res0.mesh.set_attr("v", np.zeros_like(res0.mesh.points))
            with stage("save", times):
                save_mesh(path0, res0.mesh)
        if glb_frames is not None:
            # out_frames rows are the FINAL frames 1+ (post morph/psd),
            # matching the per-frame files written above
            glb_frames.append(np.asarray(res0.mesh.points, np.float32))
            if len(rigs) > 1:
                glb_frames.extend(np.asarray(out_frames, np.float32))
    else:
        vel_fps = args.out_velocity
        prev_pts = None      # previous frame's DEFORMED positions
        # quaternion attrs need sign continuity across frames (see the
        # batch path): chain each frame's transported quats to the last
        tq_names = []
        if args.update_normals or args.transform_attrs:
            sel_n, sel_k, _ = _select_transport_attrs(args, mesh)
            tq_names = [nm for nm, k in zip(sel_n, sel_k)
                        if k == "quaternion"]
        prev_q: dict = {}
        held0 = None         # (mesh, path): frame 0 deferred until v_0 known
        for f, rig in enumerate(rigs):
            with stage(f"cook[{f}]", times):
                res = node.cook(
                    [mesh, rest_rig, rig] + blends, cfg, params,
                    group=args.group, picked=args.picked,
                    deformer=_red_frame_deformer(f) if red_seq else None,
                    update_normals=args.update_normals,
                    transform_attrs=_split_attr_names(args.transform_attrs),
                    output_stretch=args.output_stretch,
                    recompute_normals=args.recompute_normals,
                    examples=examples, psd_lam=args.psd_lambda,
                    psd_eps=args.psd_eps, psd_normalize=args.psd_normalize,
                    psd_align=args.psd_align, psd=psd_loaded,
                    secondary=sec_meshes,
                )
            for w in res.warnings:
                if w not in warned:  # each distinct warning once per sequence
                    warned.add(w)
                    print(f"warning: {w}", file=sys.stderr)
            for nm in tq_names:
                cur = res.mesh.attr(nm)
                if cur is None:
                    continue
                if nm in prev_q:
                    cur = _chain_quat_sign(prev_q[nm], cur)
                    res.mesh.set_attr(nm, cur)
                prev_q[nm] = cur
            if glb_frames is not None:
                glb_frames.append(np.asarray(res.mesh.points, np.float32))
            for (_, sec_pat), sm in zip(args.secondary, res.secondary):
                with stage("save", times):
                    save_mesh(os.path.join(args.outdir, sec_pat % f), sm)
            out_path = os.path.join(args.outdir, args.out_pattern % f)
            if vel_fps is not None:
                # backward difference of deformed positions; frame 0 uses
                # the forward difference, so its write waits for frame 1
                # (O(1) memory: only one frame is ever held)
                if f == 0 and len(rigs) > 1:
                    held0 = (res.mesh, out_path)
                else:
                    if f == 0:          # single-frame sequence
                        res.mesh.set_attr(
                            "v", np.zeros_like(res.mesh.points))
                    else:
                        if held0 is not None:
                            m0, p0 = held0
                            m0.set_attr("v", ((
                                res.mesh.points - m0.points) * vel_fps
                            ).astype(np.float32))
                            with stage("save", times):
                                save_mesh(p0, m0)
                            held0 = None
                        res.mesh.set_attr("v", ((
                            res.mesh.points - prev_pts) * vel_fps
                        ).astype(np.float32))
                    with stage("save", times):
                        save_mesh(out_path, res.mesh)
                prev_pts = res.mesh.points
            else:
                with stage("save", times):
                    save_mesh(out_path, res.mesh)
    n = len(rigs)
    dt = time.time() - t0
    if glb_frames:
        rank = getattr(args, "gltf_rank", None)
        if rank is not None:
            from facedeform_tpu.ops.blendshapes import fit_blendshapes

            # Multi-chip hosts shard the (F, 3V) slab over the vertex
            # axis automatically (one Gram psum, row-local basis matmul —
            # parallel/blendshapes_sharded); single-chip is unchanged.
            import jax as _jax

            bs_mesh = None
            if len(_jax.devices()) > 1:
                from facedeform_tpu.parallel.sharding import make_mesh

                bs_mesh = make_mesh()
            with stage("bake_shapes", times):
                bs_model, bs_report = fit_blendshapes(
                    mesh.points, np.stack(glb_frames), rank, mesh=bs_mesh
                )
            print(
                f"info: blendshape bake: {bs_model.n_targets} targets over "
                f"{len(glb_frames)} frames — rmse {bs_report.rmse:.3e}, "
                f"max err {bs_report.max_err:.3e}, "
                f"energy {100.0 * bs_report.energy:.2f}%",
                file=sys.stderr,
            )
            if args.save_shapes:
                from facedeform_tpu.utils import checkpoint as ckpt_mod

                ckpt_mod.save_blendshapes(args.save_shapes, bs_model, bs_report)
                print(
                    f"info: saved blendshape checkpoint {args.save_shapes}",
                    file=sys.stderr,
                )
            if args.gltf:
                from facedeform_tpu.geometry.gltf_io import save_glb_targets

                with stage("gltf", times):
                    save_glb_targets(
                        args.gltf, mesh,
                        np.asarray(bs_model.targets),
                        np.asarray(bs_model.weights),
                        fps=args.gltf_fps, names=bs_model.target_names(),
                    )
                print(
                    f"info: wrote glTF binary {args.gltf} "
                    f"({bs_model.n_targets} PCA morph targets, "
                    f"{len(glb_frames)} weight keyframes)",
                    file=sys.stderr,
                )
        else:
            from facedeform_tpu.geometry.gltf_io import save_glb_morph

            with stage("gltf", times):
                save_glb_morph(
                    args.gltf, mesh, np.stack(glb_frames), fps=args.gltf_fps
                )
            print(
                f"info: wrote glTF binary {args.gltf} "
                f"({len(glb_frames)} morph-target keyframes)",
                file=sys.stderr,
            )
    if args.save_deformer:
        if seq_ckpt is not None:
            # batch path: the whole F-frame shot in one sequence
            # checkpoint (serve load / apply_seq ready)
            from facedeform_tpu.utils import checkpoint

            if seq_ckpt[0] == "pu_seq":
                checkpoint.save_pu_seq(args.save_deformer, seq_ckpt[1])
            else:
                model_all, resid = seq_ckpt[1]
                checkpoint.save_seq(
                    args.save_deformer, model_all, cfg, params, resid
                )
            print(
                f"checkpointed the {len(rigs)}-frame sequence "
                f"({seq_ckpt[0]}) to {args.save_deformer}",
                file=sys.stderr,
            )
        else:
            # per-frame path: the last frame's solved deformer (matches
            # deform's semantics of checkpointing the node's end state)
            _save_deformer(node, args.save_deformer)
    if args.save_psd:
        rc = _save_psd_state(node, args.save_psd)
        if rc:
            return rc
    if args.timing:
        print(f"timing: {times.summary()}", file=sys.stderr)
    print(
        f"wrote {n} frames to {args.outdir}/{args.out_pattern} "
        f"({dt / max(n, 1) * 1e3:.0f} ms/frame incl. IO)"
    )
    return 0


def _cmd_invert(args) -> int:
    """Inverse rig fit: target mesh -> recovered deformed rig.

    Mirrors the forward pipeline's gating so the recovered rig reproduces
    the target through `deform`: the same capture pass supplies the
    falloff distances fit_rig models (node.cook's dist2), and --group
    restricts the constraint set to the vertices the forward pass would
    actually write (SOP_FaceDeform.cpp:485 semantics).
    """
    from facedeform_tpu import inverse
    from facedeform_tpu.capture.capture import ProximityCapture
    from facedeform_tpu.geometry import load_mesh, save_mesh
    from facedeform_tpu.geometry.topology import compute_tangent_frame
    from facedeform_tpu.ops import fit as fit_mod
    from facedeform_tpu.utils.profiling import StageTimes, stage

    times = StageTimes()
    with stage("load", times):
        mesh = load_mesh(args.mesh)
        rest_rig = load_mesh(args.rest_rig)
        target = load_mesh(args.target)
    _print_load_warnings(
        [args.mesh, args.rest_rig, args.target], [mesh, rest_rig, target]
    )
    if target.num_points != mesh.num_points:
        print(
            f"error: target has {target.num_points} points, rest mesh has "
            f"{mesh.num_points} — the sculpt must keep the topology",
            file=sys.stderr,
        )
        return 1

    cfg, params = _cfg_params_from(args)
    n = rest_rig.num_points
    if fit_mod.uses_krylov(cfg, n):
        print(
            f"error: invert materializes the dense {n}-marker linear map; "
            "rigs past the dense limit "
            f"({fit_mod._KRYLOV_THRESHOLD}) aren't supported",
            file=sys.stderr,
        )
        return 1

    # the forward eval gates displacement by the capture falloff, so the
    # inverse must model the same gate or it misattributes attenuated
    # displacement to smaller rig motion
    with stage("capture", times):
        cap = ProximityCapture()
        cap.init(mesh, rest_rig)
        capres = cap.capture(
            max(int(params.maxedges), 1), max(float(params.radius), 0.01),
            cfg.dofalloff, float(params.falloffrate),
            strict_parity=cfg.strict_parity, metric=cfg.falloff_metric,
        )
    dist2 = capres.dist2

    frame = None
    if cfg.tangent:
        if not mesh.has_tangent_frame():
            with stage("tangent_frame", times):
                compute_tangent_frame(mesh)
        frame = tuple(
            mesh.point_attrs[k] for k in ("tangentu", "tangentv", "N")
        )

    rest_pts, tgt_pts = mesh.points, target.points
    if args.group:
        mask = mesh.select_points(args.group)
        if not mask.any():
            print(f"error: group {args.group!r} selects no points",
                  file=sys.stderr)
            return 1
        rest_pts, tgt_pts, dist2 = rest_pts[mask], tgt_pts[mask], dist2[mask]
        if frame is not None:
            frame = tuple(f[mask] for f in frame)

    with stage("fit_rig", times):
        res = inverse.fit_rig(
            rest_rig.points, rest_pts, tgt_pts, cfg, params,
            dist2=dist2, frame=frame, ridge=args.ridge,
            max_iters=args.max_iters, learning_rate=args.learning_rate,
            subsample=args.subsample or None, seed=args.seed,
        )

    out_rig = rest_rig.copy()
    out_rig.set_points(np.asarray(res.deformed_ctrl, np.float32))
    with stage("save", times):
        save_mesh(args.output, out_rig)
    route = ("closed-form" if res.iterations == 0
             else f"gradient, {res.iterations} iters")
    print(
        f"info: inverse fit ({route}): constraint rms "
        f"{float(res.residual_rms):.3e} over {rest_pts.shape[0]} vertices",
        file=sys.stderr,
    )

    if args.refit:
        # round-trip QC: deform through the FULL forward node with the
        # recovered rig and compare against the target
        from facedeform_tpu.node import FaceDeformNode

        with stage("refit", times):
            rres = FaceDeformNode().cook(
                [mesh, rest_rig, out_rig], cfg, params, group=args.group,
            )
        for w in rres.warnings:
            print(f"warning: {w}", file=sys.stderr)
        err = np.abs(rres.mesh.points - target.points)
        if args.group:
            err = err[mask]
        print(
            f"info: round trip: max |refit - target| {err.max():.3e}",
            file=sys.stderr,
        )
        with stage("save", times):
            save_mesh(args.refit, rres.mesh)
    if args.timing:
        print(f"timing: {times.summary()}", file=sys.stderr)
    print(f"wrote {args.output} ({out_rig.num_points} markers)")
    return 0


def _cmd_doctor(args) -> int:
    from facedeform_tpu.doctor import diagnose
    from facedeform_tpu.geometry import load_mesh

    mesh = load_mesh(args.mesh)
    rest_rig = load_mesh(args.rest_rig)
    posed = [load_mesh(p) for p in args.posed_rigs]
    _print_load_warnings(
        [args.mesh, args.rest_rig] + list(args.posed_rigs),
        [mesh, rest_rig] + posed,
    )
    cfg, params = _cfg_params_from(args)
    rep = diagnose(
        mesh, rest_rig, posed, cfg, params, group=args.group,
        probe_solve=args.probe_solve,
    )
    if args.as_json:
        # RFC-8259-safe: json.dumps renders float inf as the bare token
        # `Infinity`, which jq/JSON.parse reject — null the non-finites
        safe_stats = {
            k: (None if isinstance(v, float) and not np.isfinite(v) else v)
            for k, v in rep.stats.items()
        }
        print(json.dumps({
            "findings": [f._asdict() for f in rep.findings],
            "stats": safe_stats,
            "summary": rep.summary(),
        }))
    else:
        for f in rep.findings:
            print(f"{f.severity}: [{f.code}] {f.message}")
        print(rep.summary())
    return 1 if rep.errors else 0


def _cmd_warm(args) -> int:
    """Precompile the session's program set (facedeform_tpu/warmup.py)."""
    from facedeform_tpu import warmup

    cfg, params = _cfg_params_from(args)
    say = lambda s: print(f"info: {s}", file=sys.stderr)  # noqa: E731
    print(
        f"info: warming programs for {args.verts} verts x {args.controls} "
        f"controls" + (f" x {args.frames} frames" if args.frames else "")
        + " (first run pays the remote compiles; later processes at these "
          "shapes start warm)",
        file=sys.stderr,
    )
    if args.warm_solver == "pu":
        from facedeform_tpu.ops.pu import node_fit_kwargs

        # kernel/term are static jit keys: warming the default
        # THIN_PLATE programs does nothing for a gaussian session, so the
        # model flags must reach warm_pu — through node_fit_kwargs, the
        # SAME cfg->kernel/term/lam mapping every PU fit route uses
        # (effective_kernel for qnn/multilayer, QNN lam=0, clamped
        # ridge), so the warmed programs are the session's programs
        # (review findings, round 5)
        timings = warmup.warm_pu(
            controls=args.controls, queries=args.queries,
            frames=args.frames,
            patch_size=args.patch_size,
            overlap=args.overlap, progress=say,
            **node_fit_kwargs(cfg, params),
        )
    else:
        timings = warmup.warm_programs(
            verts=args.verts, controls=args.controls, frames=args.frames,
            cfg=cfg, params=params, progress=say,
        )
    if args.transport:
        t = warmup.warm_transport(
            verts=args.verts, controls=args.controls, frames=args.frames,
            cfg=cfg, params=params, progress=say,
        )
        timings.update({k: v for k, v in t.items() if k != "total"})
        timings["total"] += t["total"]
    if args.skin:
        t = warmup.warm_skinning(
            verts=min(args.verts, 100_000), bones=args.bones,
            poses=args.poses, progress=say,
        )
        timings.update({k: v for k, v in t.items() if k != "total"})
        timings["total"] += t["total"]
    if args.dbse:
        t = warmup.warm_dbse(
            verts=args.verts, shapes=args.shapes, progress=say,
        )
        timings.update({k: v for k, v in t.items() if k != "total"})
        timings["total"] += t["total"]
    print(json.dumps({k: round(v, 3) for k, v in timings.items()}))
    return 0


def _cmd_bake_skin(args) -> int:
    """Cook a pose sweep through the node, decompose it to LBS, save.

    The engine-export path: the reference (and this rebuild's `deform`)
    outputs deformed GEOMETRY; runtimes want bones + weights.  Each posed
    rig cooks through the full node (capture, falloff, group, blends,
    PSD) so the decomposition bakes everything the deformer would do —
    then ops/skinning.fit_skinning turns the sampled frames into a
    SkinningModel checkpoint."""
    import os

    from facedeform_tpu.geometry import load_mesh, save_mesh
    from facedeform_tpu.geometry.topology import compute_tangent_frame
    from facedeform_tpu.node import FaceDeformNode
    from facedeform_tpu.ops import skinning
    from facedeform_tpu.utils import checkpoint
    from facedeform_tpu.utils.profiling import StageTimes, stage

    # cook flags that bake-skin cannot honor: say so instead of silently
    # producing a bake the user didn't ask for
    for flag, val in (
        ("--save-deformer", getattr(args, "save_deformer", None)),
        ("--load-deformer", getattr(args, "load_deformer", None)),
        ("--save-psd", getattr(args, "save_psd", None)),
        ("--picked", getattr(args, "picked", False)),
    ):
        if val:
            print(
                f"warning: {flag} is ignored by bake-skin (it bakes "
                "positions only; checkpoint the solve via `deform`)",
                file=sys.stderr,
            )

    times = StageTimes()
    with stage("load", times):
        mesh = load_mesh(args.mesh)
        rest_rig = load_mesh(args.rest_rig)
        inputs = [load_mesh(p) for p in args.deform_rigs]
        # same expansion as deform/deform-seq: a morph-target .glb
        # becomes K blendshapes, not one rest mesh (review finding)
        blend_paths, blends = _load_blends(args.blend)
        examples = [(load_mesh(p), load_mesh(s)) for p, s in args.example]
    _print_load_warnings(
        [args.mesh, args.rest_rig] + list(args.deform_rigs)
        + list(blend_paths) + [p for pair in args.example for p in pair],
        [mesh, rest_rig] + inputs + blends
        + [m for pair in examples for m in pair],
    )

    if args.from_meshes:
        bad = [p for p, m in zip(args.deform_rigs, inputs)
               if m.num_points != mesh.num_points]
        if bad:
            print(
                "error: --from-meshes: posed-mesh point counts differ "
                f"from the rest mesh: {', '.join(bad)}", file=sys.stderr,
            )
            return 1
        frames = np.stack([m.points for m in inputs]).astype(np.float32)
    else:
        psd_loaded, psd_err = _load_psd_arg(args, bool(examples))
        if psd_err:
            print(f"error: {psd_err}", file=sys.stderr)
            return 1
        cfg, params = _cfg_params_from(args)
        params, tune_err = _maybe_autotune(
            args, cfg, params, rest_rig, inputs[0]
        )
        if tune_err:
            print(f"error: {tune_err}", file=sys.stderr)
            return 1
        if cfg.tangent and not mesh.has_tangent_frame():
            with stage("tangent_frame", times):
                compute_tangent_frame(mesh)
        node = FaceDeformNode()
        warned: set = set()
        cooked = []
        with stage("cook", times):
            for rig in inputs:
                res = node.cook(
                    [mesh, rest_rig, rig] + blends, cfg, params,
                    group=args.group,
                    symmetrize=args.symmetrize,
                    symmetry_tol=args.symmetry_tol,
                    examples=examples, psd_lam=args.psd_lambda,
                    psd_eps=args.psd_eps, psd_normalize=args.psd_normalize,
                    psd_align=args.psd_align, psd=psd_loaded,
                )
                for w in res.warnings:
                    if w not in warned:
                        warned.add(w)
                        print(f"warning: {w}", file=sys.stderr)
                cooked.append(np.asarray(res.mesh.points, np.float32))
        frames = np.stack(cooked)

    edges = None
    if mesh.faces is not None and len(mesh.faces):
        from facedeform_tpu.geometry.topology import unique_edges

        edges = unique_edges(mesh.faces)
    smooth_lam = float(args.smooth_weights)
    if smooth_lam > 0.0 and edges is None:
        print(
            "warning: --smooth-weights needs mesh faces (edges); the "
            "input is a point cloud — smoothing skipped", file=sys.stderr,
        )
        smooth_lam = 0.0
    with stage("fit_skinning", times):
        model, report = skinning.fit_skinning(
            mesh.points, frames, n_bones=args.bones,
            max_influences=args.max_influences,
            outer_iters=args.skin_iters, seed=args.seed,
            edges=edges, smooth_lambda=smooth_lam,
        )
    checkpoint.save_skinning(args.output, model, report)
    rough = (
        "" if report.weight_roughness is None
        else f", boundary roughness {report.weight_roughness:.4g}"
    )
    print(
        f"info: skinning: {args.bones} bones, <= {args.max_influences} "
        f"influences/vertex over {frames.shape[0]} poses; reconstruction "
        f"rmse {report.rmse:.4g} ({report.relative_rmse:.2%} of bbox), "
        f"max {report.max_err:.4g}{rough}", file=sys.stderr,
    )
    if report.relative_rmse > 0.01:
        print(
            "warning: skinning residual exceeds 1% of the bbox diagonal "
            "(the visually-lossless rule of thumb) — try more --bones, "
            "more poses, or a higher --max-influences",
            file=sys.stderr,
        )

    if args.output.lower().endswith((".glb", ".gltf")) and not args.gltf:
        print(
            "warning: -o/--output is the SkinningModel CHECKPOINT "
            f"(written as {args.output}.npz); for a glTF binary use "
            "--gltf PATH",
            file=sys.stderr,
        )
    if args.gltf:
        from facedeform_tpu.geometry.gltf_io import save_glb_skinned

        save_glb_skinned(args.gltf, mesh, model, fps=args.gltf_fps,
                         hierarchy=not args.flat_bones)
        print(
            f"info: wrote glTF binary {args.gltf} (skinned mesh + "
            f"{frames.shape[0]}-pose animation, "
            f"{'flat bones' if args.flat_bones else 'joint tree'})",
            file=sys.stderr,
        )

    if args.write_frames:
        os.makedirs(args.write_frames, exist_ok=True)
        out_mesh = mesh.copy()
        for f in range(frames.shape[0]):
            pts = np.asarray(skinning.lbs_apply(
                model.weights, model.rest,
                model.rotations[f], model.translations[f],
            ))
            out_mesh.set_points(pts)
            save_mesh(
                os.path.join(args.write_frames, "frame_%04d.obj" % f),
                out_mesh,
            )
        print(
            f"info: wrote {frames.shape[0]} LBS-reconstructed QC frames "
            f"to {args.write_frames}", file=sys.stderr,
        )
    if args.timing:
        print(f"timing: {times.summary()}", file=sys.stderr)
    print(
        f"wrote {args.output} ({model.n_bones} bones x "
        f"{model.weights.shape[0]} points, {model.n_frames} poses)"
    )
    return 0


def _cmd_bench(args) -> int:
    # Shared measurement core (facedeform_tpu/benchmark.py) — this
    # subcommand and the repo-root bench.py report the same numbers.
    from facedeform_tpu.benchmark import run_headline

    print(json.dumps(run_headline(n_ctrl=args.controls, n_verts=args.verts)))
    return 0


def main(argv=None) -> int:
    args = _build_parser().parse_args(argv)
    try:
        if args.cmd == "deform":
            return _cmd_deform(args)
        if args.cmd == "deform-seq":
            return _cmd_deform_seq(args)
        if args.cmd == "invert":
            return _cmd_invert(args)
        if args.cmd == "doctor":
            return _cmd_doctor(args)
        if args.cmd == "bake-skin":
            return _cmd_bake_skin(args)
        if args.cmd == "bench":
            return _cmd_bench(args)
        if args.cmd == "warm":
            return _cmd_warm(args)
    except (FileNotFoundError, KeyError, ValueError) as e:
        # KeyError: unknown --group name (message lists the known groups);
        # ValueError: malformed/classic .geo input (geo_io diagnosis)
        print(f"error: {e}", file=sys.stderr)
        return 1
    except Exception as e:
        # Framework errors (shape mismatch, capture/solve failure) present
        # as one-line node errors, like the reference's addError UI.
        from facedeform_tpu.utils.errors import FaceDeformError

        if isinstance(e, FaceDeformError):
            print(f"error: {e}", file=sys.stderr)
            return 1
        raise
    return 2


if __name__ == "__main__":
    sys.exit(main())
