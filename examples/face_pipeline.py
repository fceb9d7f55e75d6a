"""End-to-end example: the full facedeform-tpu pipeline on a synthetic face.

Walks every major capability in one script (the reference node's whole
feature set plus the rebuild's extensions):

  1. build a "face" (dense sphere patch) + a sparse marker rig
  2. capture: flood-fill islands + falloff distances around the markers
  3. fit the RBF deformer and apply it (fused Pallas kernel on TPU)
  4. tangent-space projection variant
  5. blendshape morph pass (DBSE least squares)
  6. inverse rig fitting: recover the rig pose from the deformed mesh
  7. animated sequence: batched multi-frame solve+eval
  8. checkpoint the deformer, write the result as OBJ
  9. named point groups + the "picked" eval-pass falloff color viz
  10. growing kernels (thin-plate) on the double-float precision path
  11. the deformation server: binary-framed client round trip
  12. partition-of-unity: a 20k-marker dense scan rig (any-N precision)
  13. any-N animated sequence: one patch factorization for a whole shot,
      one shared eval plan, sequence checkpoint
  14. deformed-normal transport through the analytic field Jacobian
  15. general attribute transport: velocity vectors and orientation
      quaternions through the same deformation gradient
  16. LOOCV autotune: radius selection by Rippa's closed form
  17. geodesic falloff: surface-path distances, no bleed across gaps
  18. symmetrize: close the rig under a mirror plane — provably
      symmetric deformation, tracker asymmetry averaged out
  19. per-marker confidence: weighted ridge smooths over a glitched
      tracker marker instead of interpolating it
  20. temporal smoothing: Savitzky-Golay over the shot's rig
      trajectories — jitter out, motion arcs through exactly
  21. doctor: lint the inputs (duplicates, units, radius, coverage,
      jitter, conditioning) before anything fits
  22. pose-space sculpt corrections (PSD): artist fixes reproduce
      exactly at their example poses, decay to zero elsewhere
  23. skinning decomposition: bake a pose sweep to engine-ready linear
      blend skinning (virtual bones + capped vertex weights)
  24. engine export both ways: skinned .glb + lossless morph-target .glb
  25. compressed engine export: PCA blendshape bake (targets + curves)
  26. driven secondary meshes: teeth ride the same solved field

Run:  PYTHONPATH=. python examples/face_pipeline.py [--out /tmp/fd_demo]
"""

import argparse
import os
import time

import numpy as np
import jax.numpy as jnp

from facedeform_tpu import (
    DeformConfig,
    DeformParams,
    Deformer,
    FaceDeformNode,
    Mesh,
    fit_rig,
)
from facedeform_tpu.geometry.obj_io import save_obj
from facedeform_tpu.geometry.primitives import fibonacci_points, uv_sphere
from facedeform_tpu.geometry.topology import compute_tangent_frame
from facedeform_tpu.parallel import batched, sharding
from facedeform_tpu.utils import checkpoint
from facedeform_tpu.utils.profiling import StageTimes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/fd_demo")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(7)

    # 1. geometry: dense "face" + sparse rig with two marker groups
    face = uv_sphere(120, 120)                     # ~14.4k vertices
    compute_tangent_frame(face)
    rig = Mesh(points=fibonacci_points(40))
    rig.set_attr("class", (np.arange(40) % 2).astype(np.int32))
    smile = 0.25 * np.exp(-4 * np.sum((rig.points - [0, -0.4, 0.9]) ** 2, -1,
                                      keepdims=True))
    posed = Mesh(points=rig.points + smile * np.float32([0, -0.3, 0.4]))

    # 2-5. the node runs capture -> solve -> eval -> morph in one cook
    blends = [
        Mesh(points=face.points + 0.03 * rng.standard_normal(
            (face.num_points, 3)).astype(np.float32))
        for _ in range(4)
    ]
    times = StageTimes()
    node = FaceDeformNode()
    cfg = DeformConfig(tangent=True, morphspace=True, dofalloff=True)
    params = DeformParams(radius=0.8, maxedges=10, falloffrate=1.5)
    result = node.cook([face, rig, posed] + blends, cfg, params, times=times)
    print(f"cook: {times.summary()}")
    print(f"  captured {int(result.capture.captured.sum())} vertices in "
          f"{len(result.capture.islands)} islands")
    print(f"  blend weights: {np.round(result.weights, 4)}")
    for w in result.warnings:
        print(f"  warning: {w}")

    # 6. inverse rigging: recover the rig from the deformed mesh
    plain = FaceDeformNode().cook([face, rig, posed], DeformConfig(), params)
    inv = fit_rig(rig.points, face.points, plain.mesh.points,
                  DeformConfig(), params, ridge=1e-8)
    err = np.abs(np.asarray(inv.deformed_ctrl) - posed.points).max()
    print(f"inverse rig: recovered pose to {err:.2e} (rms {float(inv.residual_rms):.2e})")

    # 7. animated sequence: batched solve + sharded eval
    frames = jnp.asarray(np.stack([
        rig.points + t * smile * np.float32([0, -0.3, 0.4])
        for t in np.linspace(0, 1, 12)
    ]))
    mesh_dev = sharding.make_mesh()
    model, _ = batched.fit_frames(jnp.asarray(rig.points), frames,
                                  DeformConfig(), params)
    t0 = time.time()
    seq, _ = batched.apply_frames(
        model, jnp.asarray(face.points),
        jnp.zeros(face.num_points), jnp.ones(face.num_points),
        DeformConfig(), params, mesh_dev,
    )
    seq = np.asarray(seq)
    print(f"animated 12 frames x {face.num_points} verts in "
          f"{(time.time() - t0) * 1e3:.0f} ms -> {seq.shape}")

    # 8. persist: checkpoint + OBJ + Houdini JSON .geo (attrs/groups ride
    # along, so the result drops straight back into a Houdini scene)
    from facedeform_tpu.geometry.geo_io import save_geo

    d = Deformer.fit(rig.points, posed.points, DeformConfig(), params)
    checkpoint.save(os.path.join(args.out, "deformer.npz"), d)
    save_obj(os.path.join(args.out, "deformed.obj"), result.mesh)
    save_geo(os.path.join(args.out, "deformed.geo"), result.mesh)
    print(f"wrote {args.out}/deformed.obj, deformed.geo and deformer.npz")

    # 9. named point groups + "picked" falloff viz (the reference's group
    # parameter and selected-node color display)
    face.set_group("brow", face.points[:, 1] > 0.55)
    sel = node.cook([face, rig, posed], DeformConfig(dofalloff=True), params,
                    group="brow", picked=True)
    moved = np.linalg.norm(sel.mesh.points - face.points, axis=1)
    print(f"group 'brow': {int(face.group_mask('brow').sum())} points eligible, "
          f"{int((moved > 1e-6).sum())} moved; Cd = falloff hue viz")

    # 10. growing kernels route through the double-float precision path
    # (thin-plate in f32 would break the 5e-5 parity budget; 'auto' picks
    # the fused Mosaic df kernel on TPU)
    from facedeform_tpu.config import RBFKernel, RBFModelType

    cfg_tps = DeformConfig(model=RBFModelType.KERNEL,
                           kernel=RBFKernel.THIN_PLATE)
    d_tps = Deformer.fit(rig.points, posed.points, cfg_tps,
                         DeformParams(radius=1.0, lam=0.01))
    tps_pts, _ = d_tps.apply(face.points)
    print(f"thin-plate deform (df precise path): "
          f"max move {float(np.abs(np.asarray(tps_pts) - face.points).max()):.3f}")

    # 11. the deformation server, binary framing (solve-once / serve-many)
    import threading

    from facedeform_tpu import serve as serve_mod

    ready = threading.Event()
    holder = {}

    def _run_server():
        srv = serve_mod._ThreadedTCP(("127.0.0.1", 0), serve_mod._Handler)
        srv.deform_server = serve_mod.DeformServer()
        holder["srv"] = srv
        ready.set()
        srv.serve_forever()

    threading.Thread(target=_run_server, daemon=True).start()
    ready.wait(10)
    client = serve_mod.Client(*holder["srv"].server_address)
    did = client.fit(rig.points, posed.points)
    t0 = time.time()
    served_pts, _ = client.apply(did, face.points)
    print(f"served deform ({face.num_points} verts, binary framing): "
          f"{(time.time() - t0) * 1e3:.0f} ms round trip")
    # blendshapes as a service: the basis lives server-side, whole shots
    # morph per request (one vmapped DBSE solve; per-pose health mask)
    bid = client.fit_dbse(face.points, np.stack([b.points for b in blends]))
    shot_poses = np.stack([served_pts, np.asarray(result.mesh.points)])
    morphed, bw, ok = client.morph(bid, shot_poses)
    print(f"served morph: {morphed.shape[0]} poses -> weights "
          f"{np.round(bw[0], 3)} (all ok: {bool(ok.all())})")
    client.shutdown()

    # 12. partition-of-unity: dense scan-scale rigs (beyond the global
    # solvers' reach) at dense double-float precision — also reachable as
    # DeformConfig(solver="pu") through the node/CLI
    from facedeform_tpu import PUDeformer

    scan_rig = fibonacci_points(20000)
    scan_disp = (0.08 * np.exp(
        -4 * np.sum((scan_rig - [0, 1, 0]) ** 2, -1, keepdims=True)
    ).astype(np.float32) * np.float32([0, 1, 0]))
    t0 = time.time()
    pud = PUDeformer.fit(scan_rig, scan_rig + scan_disp,
                         kernel=RBFKernel.THIN_PLATE, lam=1e-5)
    back = pud.displacement(scan_rig)
    err = float(np.abs(np.asarray(back) - scan_disp).max())
    print(f"PU 20k-marker rig: fit+check {time.time() - t0:.1f} s, "
          f"{pud.patches.idx.shape[0]} patches, interp err {err:.1e}")

    # 13. any-N animated sequence: every frame shares the scan rig's patch
    # factorization (frames are RHS columns) and ONE eval plan; the whole
    # shot then runs in a single Mosaic frames pass per <=32-frame chunk,
    # and checkpoints as one file (geometry stored once)
    from facedeform_tpu.ops.pu import PUSeqDeformer

    scan_frames = np.stack([
        scan_rig + t * scan_disp for t in np.linspace(0.25, 1.0, 6)
    ])
    t0 = time.time()
    shot = PUSeqDeformer.fit(scan_rig, scan_frames,
                             kernel=RBFKernel.THIN_PLATE, lam=1e-5)
    fit_s = time.time() - t0
    t0 = time.time()
    shot_disp = np.asarray(shot.displacement_frames(scan_rig[:4096]))
    print(f"PU shot: 6-frame fit {fit_s:.1f} s (one factorization), "
          f"eval {shot_disp.shape} in {(time.time() - t0) * 1e3:.0f} ms")
    checkpoint.save_pu_seq(os.path.join(args.out, "shot.npz"), shot)
    restored = checkpoint.load_pu_seq(os.path.join(args.out, "shot.npz"))
    r_err = float(np.abs(
        np.asarray(restored.displacement_frames(scan_rig[:4096])) - shot_disp
    ).max())
    print(f"sequence checkpoint round trip: {r_err:.1e}")

    # 14. deformed-normal transport: the reference leaves rest-pose normals
    # on the deformed mesh; the analytic displacement Jacobian fixes N
    # (node update_normals / CLI --update-normals does this inside cook)
    n_attr = (face.points / np.linalg.norm(
        face.points, axis=1, keepdims=True
    )).astype(np.float32)
    face.set_attr("N", n_attr)
    res_n = FaceDeformNode().cook(
        [face, rig, posed], DeformConfig(), params, update_normals=True
    )
    tilt = np.degrees(np.arccos(np.clip(np.sum(
        res_n.mesh.attr("N") * n_attr, axis=1
    ), -1, 1)))
    print(f"normal transport: max normal tilt {tilt.max():.1f} deg over "
          f"{int((tilt > 0.5).sum())} vertices (rest normals would be stale)")

    # 15. general attribute transport: any (V,3) attr pushes forward as a
    # tangent vector v' = F v, any (V,4) attr as an orientation quaternion
    # rotated by F's polar factor — one shared Jacobian pass for all of
    # them (cook transform_attrs / CLI --transform-attrs v,orient)
    face.set_attr("v", rng.standard_normal(
        (face.num_points, 3)).astype(np.float32))
    orient = np.tile(np.float32([0, 0, 0, 1]), (face.num_points, 1))
    face.set_attr("orient", orient)
    res_a = FaceDeformNode().cook(
        [face, rig, posed], DeformConfig(), params,
        transform_attrs=("v", "orient"), output_stretch=True,
    )
    dv = np.linalg.norm(res_a.mesh.attr("v") - face.attr("v"), axis=1)
    qd = np.abs(res_a.mesh.attr("orient") - orient).max()
    smax = float(res_a.mesh.attr("fd_stretch").max())
    print(f"attribute transport: v changed on {int((dv > 1e-6).sum())} "
          f"vertices (max |dv| {dv.max():.3f}); orient max delta {qd:.3f} "
          f"(pure rotation part only); peak surface stretch {smax:.2f}x "
          "(fd_stretch QC attr)")

    # 16. LOOCV autotune: pick the kernel radius by Rippa's closed-form
    # leave-one-out error — one factorization per candidate, no refits
    # (ops/loocv.py; CLI --autotune)
    from facedeform_tpu.config import RBFKernel, RBFModelType
    from facedeform_tpu.ops import loocv

    kcfg = DeformConfig(model=RBFModelType.KERNEL, kernel=RBFKernel.GAUSSIAN)
    d_auto, diag = loocv.fit_auto(
        rig.points, posed.points, kcfg, DeformParams(radius=1.0, lam=0.01))
    print(f"LOOCV autotune: radius x{diag['best_factor']:g} "
          f"(LOO rms {diag['best_score']:.2e} vs "
          f"{diag['scores'][len(diag['factors']) // 2, 0]:.2e} at x1)")

    # 17. geodesic falloff: distances measured along the surface, so a
    # marker cannot drag geometry that is near in space but far along the
    # mesh (the upper-lip/lower-lip bleed; cfg.falloff_metric="geodesic")
    res_geo = FaceDeformNode().cook(
        [face, rig, posed],
        DeformConfig(dofalloff=True, falloff_metric="geodesic"), params,
    )
    res_euc = FaceDeformNode().cook(
        [face, rig, posed], DeformConfig(dofalloff=True), params,
    )
    fg = res_geo.mesh.attr("fd_falloff")
    fe = res_euc.mesh.attr("fd_falloff")
    print(f"geodesic falloff: {int((fg < fe - 1e-3).sum())} vertices "
          "attenuate harder than euclidean (surface path longer than the "
          "straight line)")

    # 18. symmetrize: close the rig under the x-mirror so the deformation
    # provably commutes with it — tracker asymmetry is averaged out,
    # one-sided markers are mirrored in (ops/symmetry.py; CLI --symmetrize x)
    from facedeform_tpu.ops import symmetry as sym

    sym_node = FaceDeformNode()
    res_plain = sym_node.cook([face, rig, posed], DeformConfig(), params)
    res_sym = sym_node.cook(
        [face, rig, posed], DeformConfig(), params, symmetrize="x",
    )
    mi, ok = sym.mirror_map(face.points, "x")
    d_plain = np.asarray(res_plain.mesh.points) - face.points
    d_symm = np.asarray(res_sym.mesh.points) - face.points
    print(f"symmetrize: displacement asymmetry "
          f"{sym.symmetry_error(d_plain, mi, ok):.3f} -> "
          f"{sym.symmetry_error(d_symm, mi, ok):.2e} "
          f"({res_sym.messages[0]})")

    # 19. per-marker confidence: a glitched tracker marker is smoothed
    # over (weighted ridge lam/c_i) instead of dragging the face
    # (Deformer.fit(confidence=) / rest-rig `confidence` attr)
    glitched = Mesh(points=posed.points.copy())
    glitched.points[5] += np.float32([0.4, -0.3, 0.2])
    conf = np.ones(rig.num_points, np.float32)
    conf[5] = 0.001
    kp = DeformParams(radius=1.0, lam=0.01)
    d_noconf = Deformer.fit(rig.points, glitched.points, kcfg, kp)
    d_conf = Deformer.fit(rig.points, glitched.points, kcfg, kp,
                          confidence=conf)
    d_clean = Deformer.fit(rig.points, posed.points, kcfg, kp)
    f_clean = np.asarray(d_clean.apply(face.points)[0])
    e_no = np.abs(np.asarray(d_noconf.apply(face.points)[0]) - f_clean).max()
    e_cf = np.abs(np.asarray(d_conf.apply(face.points)[0]) - f_clean).max()
    print(f"confidence: glitched-marker field error {e_no:.3f} -> "
          f"{e_cf:.4f} vs the clean fit ({e_no / max(e_cf, 1e-9):.0f}x)")

    # 20. temporal smoothing: jittered tracker trajectories are filtered
    # by the SG operator — the underlying motion arc survives exactly
    # (ops/temporal.py; CLI deform-seq --temporal-smooth 7)
    from facedeform_tpu.ops import temporal

    t_lin = np.linspace(0, 1, 16, dtype=np.float32)[:, None, None]
    shot_clean = rig.points[None] + t_lin * smile * np.float32([0, -0.3, 0.4])
    shot_noisy = shot_clean + 0.01 * rng.standard_normal(
        shot_clean.shape).astype(np.float32)
    shot_sm = temporal.smooth_frames(shot_noisy, window=7, order=2)
    j_before = float(np.sqrt(((shot_noisy - shot_clean) ** 2).mean()))
    j_after = float(np.sqrt(((shot_sm - shot_clean) ** 2).mean()))
    print(f"temporal smooth: trajectory error rms {j_before:.4f} -> "
          f"{j_after:.4f} ({j_before / max(j_after, 1e-12):.1f}x) — "
          "the motion arc itself is untouched")

    # 21. doctor: lint the inputs before anything fits (CLI `doctor`)
    from facedeform_tpu.doctor import diagnose

    flawed = rig.points.copy()
    flawed[7] = flawed[6] + 1e-6                     # duplicate marker
    rep = diagnose(
        face, Mesh(points=flawed),
        [Mesh(points=f) for f in shot_noisy],
        DeformConfig(), DeformParams(radius=0.01),   # radius too small too
    )
    print(f"doctor: {rep.summary()}")
    for f in rep.findings:
        print(f"  {f.severity}: [{f.code}] {f.message[:72]}...")

    # 22. pose-space sculpt corrections (PSD): an artist fixes what the
    # deformer got wrong at one pose; the fix reproduces exactly at that
    # pose and decays to zero on unrelated poses (ops/psd.py;
    # CLI --example POSED SCULPT, --save-psd/--load-psd)
    psd_node = FaceDeformNode()
    base22 = psd_node.cook([face, rig, posed], DeformConfig(), params).mesh
    bump = 0.1 * np.exp(-6 * np.sum((base22.points - [0, -0.3, 1.0]) ** 2,
                                    -1)).astype(np.float32)
    sculpt = Mesh(points=base22.points + bump[:, None] * np.float32([0, 0, 1]))
    res_at = psd_node.cook([face, rig, posed], DeformConfig(), params,
                           examples=[(posed, sculpt)])
    frown = Mesh(points=rig.points - smile * np.float32([0, -0.3, 0.4]))
    base_far = FaceDeformNode().cook(
        [face, rig, frown], DeformConfig(), params).mesh
    res_far = psd_node.cook([face, rig, frown], DeformConfig(), params,
                            examples=[(posed, sculpt)])
    e_at = np.abs(np.asarray(res_at.mesh.points) - sculpt.points).max()
    e_far = np.abs(np.asarray(res_far.mesh.points) - base_far.points).max()
    print(f"psd: sculpt reproduced to {e_at:.2e} at its pose; "
          f"leakage onto an opposite pose {e_far:.2e} "
          f"(sculpt moved the face {bump.max():.2f})")

    # 23. skinning decomposition: sample the deformer over a pose sweep
    # and bake it to LBS — what game/crowd runtimes actually evaluate
    # (ops/skinning.py; CLI `bake-skin`; checkpoint kind "skin")
    from facedeform_tpu.ops import skinning

    sweep = []
    for s in (0.33, 0.66, 1.0):
        ds = Deformer.fit(
            rig.points, rig.points + s * (posed.points - rig.points),
            DeformConfig(), params,
        )
        sweep.append(np.asarray(ds.apply(face.points)[0]))
    skin_model, skin_rep = skinning.fit_skinning(
        face.points, np.stack(sweep), n_bones=12, max_influences=4
    )
    checkpoint.save_skinning(os.path.join(args.out, "skin.npz"),
                             skin_model, skin_rep)
    print(f"skinning: {skin_model.n_bones} bones, <=4 influences/vertex; "
          f"LBS reconstruction rmse {skin_rep.relative_rmse:.2%} of bbox "
          f"-> {os.path.join(args.out, 'skin.npz')}")

    # 24. engine export, both routes: the baked skin as a skinned .glb
    # (compact, riggable, lossy by skin_rep.rmse) and the pose sweep as
    # a morph-target .glb (exact at every keyframe, sparse where the
    # deformation is localized); both open in any glTF viewer/engine
    from facedeform_tpu.geometry import gltf_io

    skin_glb = os.path.join(args.out, "skin.glb")
    gltf_io.save_glb_skinned(skin_glb, face, skin_model)
    shot_glb = os.path.join(args.out, "shot.glb")
    gltf_io.save_glb_morph(shot_glb, face, np.stack(sweep))
    g, blob = gltf_io.load_glb(shot_glb)
    prim = g["meshes"][0]["primitives"][0]
    n_sparse = sum(
        "sparse" in g["accessors"][t["POSITION"]] for t in prim["targets"]
    )
    print(f"glTF export: {skin_glb} (skinned, "
          f"{os.path.getsize(skin_glb) // 1024} KB) and {shot_glb} "
          f"(morph targets, {os.path.getsize(shot_glb) // 1024} KB, "
          f"{n_sparse}/{len(prim['targets'])} sparse); .glb is also a "
          f"valid input everywhere (geometry.load_mesh)")

    # 25. compressed engine export: bake the sweep to a PCA morph-target
    # basis + weight curves (L2-optimal rank-K; CLI deform-seq
    # --gltf-rank, serve fit_shapes, checkpoint kind "shapes") — and
    # close the loop the reference leaves open: the baked targets feed
    # the morphspace (DBSE) pass as blendshape inputs
    from facedeform_tpu.ops import blendshapes

    bs_model, bs_rep = blendshapes.fit_blendshapes(
        face.points, np.stack(sweep), rank=2
    )
    bake_glb = os.path.join(args.out, "shot_pca.glb")
    gltf_io.save_glb_targets(
        bake_glb, face, np.asarray(bs_model.targets),
        np.asarray(bs_model.weights), names=bs_model.target_names(),
    )
    checkpoint.save_blendshapes(
        os.path.join(args.out, "shapes.npz"), bs_model, bs_rep
    )
    shapes_in = blendshapes.blendshape_meshes(bs_model, face)
    print(f"blendshape bake: {bs_model.n_targets} targets capture "
          f"{bs_rep.energy:.1%} of the sweep (rmse {bs_rep.rmse:.2e}) -> "
          f"{bake_glb} ({os.path.getsize(bake_glb) // 1024} KB vs "
          f"{os.path.getsize(shot_glb) // 1024} KB lossless); "
          f"{len(shapes_in)} morphspace-ready blend meshes")

    # 26. driven secondary meshes: accessories (teeth/eyes) ride the SAME
    # solved field in the same cook — full displacement, no capture gate
    # (CLI --secondary IN OUT / IN PATTERN)
    teeth = uv_sphere(10, 10)
    teeth.set_points(teeth.points * np.float32([0.45, 0.25, 0.45])
                     + np.float32([0.0, -0.15, 0.55]))
    res_sec = node.cook(
        [face, rig, posed], DeformConfig(dofalloff=True), params,
        secondary=[teeth],
    )
    moved = np.abs(res_sec.secondary[0].points - teeth.points).max()
    save_obj(os.path.join(args.out, "teeth_deformed.obj"),
             res_sec.secondary[0])
    print(f"secondary mesh: teeth ({teeth.num_points} pts) rode the face "
          f"field, max move {moved:.3f} -> teeth_deformed.obj")

    # 27. noisy tracker SHOT through the reduced-basis regression: all N
    # markers constrain K centers, and the whole shot shares ONE normal-
    # system factorization (decimate.fit_reduced_frames; CLI
    # `deform-seq --reduce-mode regress --reduce-rig K`)
    from facedeform_tpu.ops import decimate
    from facedeform_tpu.parallel import batched

    t_rng = np.random.default_rng(11)
    dense_rig = fibonacci_points(600)
    noisy = np.stack([
        dense_rig + 0.08 * np.sin(dense_rig[:, [1, 2, 0]] * (2 + 0.2 * f))
        + 0.004 * t_rng.standard_normal(dense_rig.shape)
        for f in range(5)
    ]).astype(np.float32)
    m_red, rep_red, info_red = decimate.fit_reduced_frames(
        dense_rig, noisy, 120
    )
    red_frames, _ = batched.apply_frames(
        m_red, jnp.asarray(face.points),
        jnp.zeros(face.num_points, jnp.float32),
        jnp.ones(face.num_points, jnp.float32),
        DeformConfig(), params, None, None,
    )
    print(f"reduced shot regression: {dense_rig.shape[0]} noisy markers "
          f"-> {len(info_red.idx)} centers x {noisy.shape[0]} frames in "
          f"one factorization; worst-frame misfit rms "
          f"{info_red.fit_rms.max():.4f} (injected noise 0.004), "
          f"shot eval {np.asarray(red_frames).shape}")


if __name__ == "__main__":
    main()
