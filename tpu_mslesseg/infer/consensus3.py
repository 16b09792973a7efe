"""Fused 3-plane consensus inference: the whole patient in ONE program.

The reference runs the axial/coronal/sagital experiments as three separate
pipeline invocations and fuses them on host afterwards
(``generar_consenso.py:106-117`` over volumes rebuilt by
``reconstruir_volumen.py:179-219``). The per-plane stages here already
batch each step, but a multi-stage chain still pays one dispatch per
jitted call — and on a tunneled TPU each dispatch costs a host round trip
comparable to the compute itself.

This module compiles the *entire* consensus path into a single XLA
program:

    raw volume slices (3 planes)
      -> enhancement + per-slice PNG stretch
      -> per-plane letterbox -> ONE concatenated [sum(N), 640, 640, 3]
         YOLO11-seg forward (3x the batch = better MXU utilization than
         three per-plane forwards)
      -> DFL decode + padded NMS + proto-mask union
      -> per-plane inverse-letterbox sampling -> volume scatter
      -> majority vote -> confusion counts

One dispatch, one host fetch (the 4 confusion scalars; volumes stay on
device unless the caller fetches them).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_mslesseg.core import geometry
from tpu_mslesseg.evalx import metrics as mx
from tpu_mslesseg.infer import decode as dec
from tpu_mslesseg.infer.nms import nms_batch
from tpu_mslesseg.infer.mask_union_pallas import mask_union_logits_batch
from tpu_mslesseg.model import stem_pallas
from tpu_mslesseg.model.yolo11 import fold_gray_stem
from tpu_mslesseg.infer.predictor import _bilinear_sample
from tpu_mslesseg.infer.reconstruct import consensus_vote
from tpu_mslesseg.preproc import enhance

PLANES = ("axial", "coronal", "sagital")


def set_serving_tpu_flags(env=None) -> bool:
    """Export the measured-win serving flags into LIBTPU_INIT_ARGS.

    Scoped VMEM 64 MiB is the measured knee for the fused serving
    program on v5e (round-4 flag sweep, drift-checked baseline repeat:
    3665.6 vs 3547.7 slices/s default, +3.3%; 96 MiB regresses to
    3487.5, 32 MiB crashes the worker). The round-5 combination sweep
    (scripts_dev/sweep_serving_flags_r5.py) added
    ``--xla_tpu_rwb_fusion=false`` on top: 3719.0 vs 3643.8/3661.7
    slices/s for 64 MiB alone (+1.8%, drift band ±0.25%), with
    voxel-exact outputs (position-weighted checksums of all plane
    volumes + consensus match bitwise). Limits above 64 MiB regress
    monotonically (80M 3512.9, 96M 3484.8, 128M 3405.8); rwb-off alone
    is 3593.8 — the knobs only win together. Scoped VMEM 64M REGRESSES
    the b=128 train step by 5% (rwb-off was not measured there), and the per-program `jax.jit compiler_options`
    route is catastrophic through the axon tunnel (measured 180 slices/s
    — 20× slower than default; computation-level env overrides appear to
    defeat the remote executor's caching), so the deployment is the
    process env var, called ONLY by serving-only entry points BEFORE the
    TPU backend initializes (libtpu reads the env at plugin init):
    the pipeline CLI when the invocation cannot train
    (``ejecutar_pipeline.invocacion_solo_servicio``), the standalone
    prediction stage, and bench.py's flagged serving child — all through
    THIS function so the flag string cannot drift.

    ``env``: the mapping to mutate (default ``os.environ``) — bench.py
    passes its subprocess env dict. Respects a user-provided scoped-vmem
    or rwb-fusion setting (either present → untouched); opt out with
    TPU_MSLESSEG_NO_TPU_FLAGS=1. Returns True iff the MEASURED config is
    (already or now) in effect in ``env`` — a user-managed env that sets
    either knob to anything else returns False, so callers (bench.py's
    ``serving_vmem_flag`` label) never report the measured configuration
    when something else actually runs."""
    import os

    if env is None:
        env = os.environ
    if env.get("TPU_MSLESSEG_NO_TPU_FLAGS") == "1":
        return False
    measured = (
        "--xla_tpu_scoped_vmem_limit_kib=65536",
        "--xla_tpu_rwb_fusion=false",
    )
    cur = env.get("LIBTPU_INIT_ARGS", "")
    if ("--xla_tpu_scoped_vmem_limit_kib" in cur
            or "--xla_tpu_rwb_fusion" in cur):
        # user manages these knobs: leave untouched, report honestly
        return all(f in cur for f in measured)
    env["LIBTPU_INIT_ARGS"] = (cur + " " + " ".join(measured)).strip()
    return True


class ConsensusPredictor:
    """Single-program 3-plane predict + reconstruct + consensus + metrics.

    Usage:
        cp = ConsensusPredictor(model, variables, vol_shape=(182, 218, 182),
                                mejora="GC")
        counts, consensus, vols = cp(slices_by_plane, idx_by_plane, gt_vol)
        metrics = cp.metrics_from_counts(counts)   # host-side dict

    `slices_by_plane[p]` are RAW volume-space slices [N_p, h_p, w_p]
    (float); enhancement and the PNG min-max stretch happen on device.
    """

    def __init__(
        self,
        model,
        variables,
        vol_shape,
        mejora: str | None = "Base",
        imgsz: int = 640,
        conf: float = 0.25,
        iou: float = 0.7,
        max_det: int = 300,
        umbral: int = 2,
        mask_thresh: float = 0.0,
        platform: str | None = None,
        mesh=None,
        planes=PLANES,
        per_plane_counts: bool = False,
    ):
        self.model = model
        self.platform = platform
        self.planes = tuple(planes)
        self.per_plane_counts = per_plane_counts
        if len(self.planes) != 3 and not per_plane_counts:
            raise ValueError(
                "sin los tres planos no hay consenso: use per_plane_counts=True"
            )
        # grayscale input: stem kernel folded over in_ch (the network
        # consumes [B, S, S, 1]; skips the 3-channel repeat broadcast)
        if isinstance(variables, dict) and "params" not in variables:
            variables = {p: fold_gray_stem(v) for p, v in variables.items()}
        else:
            variables = fold_gray_stem(variables)
        self.mesh = mesh
        if mesh is not None:
            # SPMD serving (SURVEY §2.3 data-parallel mandate covers
            # inference too): params replicated over the mesh, slice
            # batches sharded over 'data' at the call sites — XLA
            # propagates the sharding through the fused program and
            # inserts the collectives for the volume scatters/counts
            from tpu_mslesseg.core import mesh as meshlib

            variables = jax.device_put(variables, meshlib.replicated(mesh))
        self.variables = variables
        self.vol_shape = tuple(vol_shape)
        self.mejora = mejora
        self.imgsz = imgsz
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        self.umbral = umbral
        self.mask_thresh = mask_thresh
        self.lb = {}
        for p in self.planes:
            h, w = geometry.slice_shape(self.vol_shape, p)
            # PNG-space (model) dims are transposed volume-slice dims
            self.lb[p] = dec.Letterbox(src_h=w, src_w=h, size=imgsz)
        # Opt-in fused Pallas stem — measured slower than XLA's conv
        # chain on v5e (lane-padding waste; docs/stem_kernel_analysis.md)
        self._stem_w = stem_pallas.maybe_build(
            self.variables, model.dtype, platform, imgsz
        )
        self._jitted = jax.jit(self._run)
        # serving mode: one program over a batch of patients. NOT a
        # whole-program vmap — that lowers measurably worse (about 1.2x
        # slower end to end, and 2x on XLA-CPU, even at P=1); instead the
        # patient axis is reshaped into the slice batch so the forward/
        # NMS program is byte-identical to the single-patient one, and
        # only the per-patient scatters/counts are vmapped
        self._jitted_lote = jax.jit(self._run_lote)

    def _union_logits(self, variables, slices):
        """Enhance + letterbox each plane's slice batch, run the forward +
        NMS + proto-mask union, all in the enclosing jit. Returns
        (union [sum(n_mod*N), mh, mw] logits, segments: list of
        (plane, n_mod, N)).

        `variables` may be one shared pytree (a single concatenated
        forward — the serving/bench fast case) or {plane: pytree} (the
        product case: each anatomical plane was trained separately,
        reference ``ejecutar_pipeline.py`` runs one experiment per plane).
        `slices[p]` may be [N, h, w] or {modalidad: [N, h, w]} — each
        modality predicts separately and the binary masks union, exactly
        like the stage chain (``generar_predicciones.py`` multimodal
        loop)."""
        reg_max = self.model.cfg.reg_max
        per_plane_vars = isinstance(variables, dict) and "params" not in variables
        segs = []
        xs_by_plane = []
        for p in self.planes:
            mods = slices[p] if isinstance(slices[p], dict) else {None: slices[p]}
            xs = []
            n = None
            for sl in mods.values():
                img_u8 = enhance.enhance_for_model(sl, self.mejora)
                png = geometry.to_png_space_batch(img_u8).astype(jnp.float32) / 255.0
                xs.append(self.lb[p].apply(png))
                n = sl.shape[0]
            x = jnp.concatenate(xs, axis=0)
            # cast to the model's compute dtype here: the first conv
            # casts anyway (numerics unchanged), halves the input HBM
            # footprint; single channel pairs with fold_gray_stem
            x = x.astype(self.model.dtype)  # [n_mod*N, S, S]
            xs_by_plane.append(x)
            segs.append((p, len(mods), n))

        def fwd(vs, x3, stem_w):
            """Forward on grayscale [M, S, S]: Pallas fused stem on TPU
            (b0+b1 in one VMEM program), plain conv chain elsewhere."""
            if stem_w is not None:
                y = stem_pallas.stem_apply(stem_w, stem_pallas.stem_s2d(x3))
                return self.model.apply(vs, y, train=False, from_p2=True)
            return self.model.apply(vs, x3[..., None], train=False)

        if per_plane_vars:
            outs = [
                fwd(variables[p], x,
                    None if self._stem_w is None else self._stem_w[p])
                for (p, _, _), x in zip(segs, xs_by_plane)
            ]
            cat = lambda key: jnp.concatenate([o[key] for o in outs], axis=0)
            flat = [dec.flatten_level_outputs(o, reg_max) for o in outs]
            box_d = jnp.concatenate([f[0] for f in flat], axis=0)
            cls_l = jnp.concatenate([f[1] for f in flat], axis=0)
            mcoef = jnp.concatenate([f[2] for f in flat], axis=0)
            proto = cat("proto")
        else:
            x = jnp.concatenate(xs_by_plane, axis=0)
            out = fwd(variables, x, self._stem_w)
            box_d, cls_l, mcoef = dec.flatten_level_outputs(out, reg_max)
            proto = out["proto"]
        anchors, strides = dec.make_anchors(self.imgsz, self.imgsz)
        scores = jax.nn.sigmoid(cls_l.astype(jnp.float32))[..., 0]
        # dense DFL decode over all anchors, then NMS. A decode-after-
        # top-k variant (gather 300 of 8400 [*,64] DFL rows, then decode)
        # measured SLOWER e2e (3030 vs 3091 slices/s): the row gather
        # costs more on TPU than the dense VPU softmax it saves.
        boxes = dec.decode_boxes(box_d, anchors, strides, reg_max)
        nb, _, keep, kidx = nms_batch(boxes, scores, self.conf, self.iou, self.max_det)
        kept_coef = jnp.take_along_axis(mcoef, kidx[..., None], axis=1)
        union = mask_union_logits_batch(
            proto, kept_coef, nb, keep, platform=self.platform
        )
        return union, segs

    def _plane_masks(self, union_p, plane):
        """Union logits [M, mh, mw] -> volume-space binary slices [M, h, w]
        via the exact inverse-letterbox sampling grid."""
        lb = self.lb[plane]
        ys, xs_g = lb.src_centers_in_letterbox()
        ys = (ys + 0.5) / 4.0 - 0.5  # letterbox px -> proto px
        xs_g = (xs_g + 0.5) / 4.0 - 0.5
        png_masks = jax.vmap(lambda m: _bilinear_sample(m, ys, xs_g))(union_p)
        return geometry.from_png_space_batch(png_masks > self.mask_thresh)

    def _run(self, variables, slices, idx, gt):
        union, segs = self._union_logits(variables, slices)
        vols = {}
        start = 0
        for p, n_mod, n in segs:
            masks = self._plane_masks(union[start : start + n_mod * n], p)
            start += n_mod * n
            if n_mod > 1:  # multimodal: binary-mask union across modalities
                masks = masks.reshape((n_mod, n) + masks.shape[1:]).any(axis=0)
            vols[p] = geometry.insert_slices(
                self.vol_shape, masks.astype(jnp.float32), p, idx[p]
            )
        cons = None
        if len(self.planes) == 3:
            cons = consensus_vote(
                vols["axial"], vols["coronal"], vols["sagital"], self.umbral
            )
        if self.per_plane_counts:
            counts = {p: mx._confusion_counts(gt, vols[p]) for p in vols}
            if cons is not None:
                counts["consenso"] = mx._confusion_counts(gt, cons)
        else:
            counts = mx._confusion_counts(gt, cons)
        return counts, cons, vols

    def _run_lote(self, variables, slices, idx, gts):
        n_pat = gts.shape[0]
        flat = {}  # [P, N, h, w] -> [P*N, h, w] (per modality when dict)
        for p in self.planes:
            sl = slices[p]
            if isinstance(sl, dict):
                flat[p] = {m: v.reshape((-1,) + v.shape[2:]) for m, v in sl.items()}
            else:
                flat[p] = sl.reshape((-1,) + sl.shape[2:])
        union, segs = self._union_logits(variables, flat)
        vols = {}
        start = 0
        for p, n_mod, n in segs:
            masks = self._plane_masks(union[start : start + n_mod * n], p)
            start += n_mod * n
            if n_mod > 1:  # multimodal: binary-mask union across modalities
                masks = masks.reshape((n_mod, n) + masks.shape[1:]).any(axis=0)
            masks = masks.reshape((n_pat, -1) + masks.shape[1:])
            vols[p] = jax.vmap(
                lambda m, i, p=p: geometry.insert_slices(
                    self.vol_shape, m.astype(jnp.float32), p, i
                )
            )(masks, idx[p])
        cons = None
        if len(self.planes) == 3:
            cons = consensus_vote(  # elementwise: batches over patients free
                vols["axial"], vols["coronal"], vols["sagital"], self.umbral
            )
        if self.per_plane_counts:
            counts = {p: jax.vmap(mx._confusion_counts)(gts, vols[p]) for p in vols}
            if cons is not None:
                counts["consenso"] = jax.vmap(mx._confusion_counts)(gts, cons)
        else:
            counts = jax.vmap(mx._confusion_counts)(gts, cons)
        return counts, cons, vols

    def __call__(self, slices, idx, gt):
        for p in self.planes:
            sl = slices[p]
            for arr in (sl.values() if isinstance(sl, dict) else [sl]):
                h, w = geometry.slice_shape(self.vol_shape, p)
                assert arr.shape[1:] == (h, w), (p, arr.shape)
        to_d = lambda v: dict(v) if isinstance(v, dict) else v
        return self._jitted(
            self.variables,
            {p: to_d(slices[p]) for p in self.planes},
            {p: idx[p] for p in self.planes},
            gt,
        )

    def lote(self, slices, idx, gts):
        """Batch of patients in ONE dispatch: `slices[p]` [P, N, h, w]
        (or {modalidad: [P, N, h, w]} — per-modality predictions union
        like the stage chain), `idx[p]` [P, N], `gts` [P, X, Y, Z].
        Returns per-patient (counts [P,4] — or {plane: [P,4]} with
        ``per_plane_counts``, consensus [P,...], vols {plane: [P,...]}).

        With a mesh, the per-patient slice axis is sharded over 'data'
        (padded to the axis size with out-of-bounds scatter indices, which
        XLA drops — results are identical to the unsharded program)."""
        slices, idx = dict(slices), dict(idx)
        for p in self.planes:
            sl = slices[p]
            for arr in (sl.values() if isinstance(sl, dict) else [sl]):
                h, w = geometry.slice_shape(self.vol_shape, p)
                assert arr.shape[2:] == (h, w), (p, arr.shape)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from tpu_mslesseg.core import mesh as meshlib

            n_data = int(self.mesh.shape[meshlib.DATA_AXIS])
            sh = NamedSharding(self.mesh, P(None, meshlib.DATA_AXIS))

            def _pad_shard(arr, pad):
                if pad:
                    arr = jnp.pad(arr, ((0, 0), (0, pad), (0, 0), (0, 0)))
                return jax.device_put(arr, sh)

            for p in self.planes:
                sl = slices[p]
                mods = sl if isinstance(sl, dict) else None
                n = next(iter(mods.values())).shape[1] if mods else sl.shape[1]
                pad = meshlib.pad_to_multiple(n, n_data) - n
                if mods is not None:
                    slices[p] = {m: _pad_shard(v, pad) for m, v in mods.items()}
                else:
                    slices[p] = _pad_shard(sl, pad)
                if pad:
                    # OOB index: the padded slices' scatter updates drop
                    idx[p] = jnp.pad(
                        idx[p], ((0, 0), (0, pad)),
                        constant_values=max(self.vol_shape),
                    )
                idx[p] = jax.device_put(idx[p], sh)
            gts = jax.device_put(gts, meshlib.replicated(self.mesh))
        to_d = lambda v: dict(v) if isinstance(v, dict) else v
        return self._jitted_lote(
            self.variables, {p: to_d(slices[p]) for p in self.planes}, idx, gts
        )

    @staticmethod
    def metrics_from_counts(counts) -> dict:
        """Host-side: fetched [tp,fp,fn,tn] -> reference metrics dict."""
        return mx.metrics_from_counts(counts)
