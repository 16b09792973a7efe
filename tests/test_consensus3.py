"""Fused 3-plane consensus program == the per-stage chain, in one jit."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_mslesseg.core import geometry
from tpu_mslesseg.evalx import metrics as mx
from tpu_mslesseg.infer.consensus3 import PLANES, ConsensusPredictor
from tpu_mslesseg.infer.predictor import SlicePredictor
from tpu_mslesseg.infer.reconstruct import consensus_vote, reconstruct_volume
from tpu_mslesseg.model.yolo11 import create_model
from tpu_mslesseg.preproc import enhance

IMGSZ = 64
VOL_SHAPE = (24, 28, 24)
N = 3


def _setup():
    rng = np.random.default_rng(0)
    vol = rng.normal(500, 150, VOL_SHAPE).astype(np.float32)
    gt = np.zeros(VOL_SHAPE, np.float32)
    gt[8:14, 10:18, 9:15] = 1
    model, _ = create_model(nc=1, scale="n")
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMGSZ, IMGSZ, 3)), train=False
    )
    slices, idx = {}, {}
    for p in PLANES:
        ax = geometry.plane_axis(p)
        ids = np.arange(5, 5 + N)
        idx[p] = jnp.asarray(ids)
        slices[p] = jnp.asarray(geometry.extract_slices(vol, p, ids))
    return model, variables, slices, idx, jnp.asarray(gt)


def test_fused_matches_stage_chain():
    model, variables, slices, idx, gt = _setup()

    cp = ConsensusPredictor(
        model, variables, VOL_SHAPE, mejora="GC", imgsz=IMGSZ, umbral=2
    )
    counts, cons, vols = cp(slices, idx, gt)

    ref_vols = {}
    for p in PLANES:
        hw = geometry.slice_shape(VOL_SHAPE, p)
        pred = SlicePredictor(model, variables, slice_hw=hw, imgsz=IMGSZ)
        imgs = enhance.enhance_for_model(slices[p], "GC")
        masks = pred(imgs)
        ref_vols[p] = reconstruct_volume(VOL_SHAPE, masks, p, idx[p])
        np.testing.assert_array_equal(np.asarray(vols[p]), np.asarray(ref_vols[p]))

    ref_cons = consensus_vote(
        ref_vols["axial"], ref_vols["coronal"], ref_vols["sagital"], 2
    )
    np.testing.assert_array_equal(np.asarray(cons), np.asarray(ref_cons))

    got = ConsensusPredictor.metrics_from_counts(counts)
    want = mx.compute_metrics(gt, ref_cons)
    for k in ("DSC", "Precision", "Recall"):
        assert got[k] == want[k]


def test_fused_is_one_program_and_scatters_all_planes():
    model, variables, slices, idx, gt = _setup()
    cp = ConsensusPredictor(model, variables, VOL_SHAPE, mejora=None, imgsz=IMGSZ)
    counts, cons, vols = cp(slices, idx, gt)
    # slices outside the predicted window stay zero in every plane volume
    for p in PLANES:
        ax = geometry.plane_axis(p)
        untouched = np.delete(np.asarray(vols[p]), np.asarray(idx[p]), axis=ax)
        assert (untouched == 0).all()
    assert np.asarray(counts).shape == (4,)


def test_lote_matches_per_patient_calls():
    model, variables, slices, idx, gt = _setup()
    cp = ConsensusPredictor(model, variables, VOL_SHAPE, mejora="GC", imgsz=IMGSZ)

    # patient 2: shifted copy of the volume slices, same GT
    slices2 = {p: jnp.flip(s, axis=1) for p, s in slices.items()}
    counts_a, cons_a, _ = cp(slices, idx, gt)
    counts_b, cons_b, _ = cp(slices2, idx, gt)

    sl = {p: jnp.stack([slices[p], slices2[p]]) for p in PLANES}
    ix = {p: jnp.stack([idx[p], idx[p]]) for p in PLANES}
    gts = jnp.stack([gt, gt])
    counts, cons, vols = cp.lote(sl, ix, gts)

    np.testing.assert_array_equal(np.asarray(counts[0]), np.asarray(counts_a))
    np.testing.assert_array_equal(np.asarray(counts[1]), np.asarray(counts_b))
    np.testing.assert_array_equal(np.asarray(cons[0]), np.asarray(cons_a))
    np.testing.assert_array_equal(np.asarray(cons[1]), np.asarray(cons_b))
    for p in PLANES:
        assert vols[p].shape == (2,) + VOL_SHAPE


def test_lote_sharded_matches_unsharded():
    """SPMD serving (VERDICT r2 #3): the lote program with the patient
    slice axis sharded over 'data' (8 virtual devices, N=3 -> padded to 8
    with OOB scatter indices) produces the same counts/consensus/volumes
    as the unsharded program."""
    from tpu_mslesseg.core import mesh as meshlib

    model, variables, slices, idx, gt = _setup()
    slices2 = {p: jnp.flip(s, axis=1) for p, s in slices.items()}
    sl = {p: jnp.stack([slices[p], slices2[p]]) for p in PLANES}
    ix = {p: jnp.stack([idx[p], idx[p]]) for p in PLANES}
    gts = jnp.stack([gt, gt])

    cp0 = ConsensusPredictor(model, variables, VOL_SHAPE, mejora="GC", imgsz=IMGSZ)
    c0, v0, vols0 = cp0.lote(sl, ix, gts)

    mesh = meshlib.make_mesh()  # all 8 virtual CPU devices, pure data axis
    cpm = ConsensusPredictor(
        model, variables, VOL_SHAPE, mejora="GC", imgsz=IMGSZ, mesh=mesh
    )
    cm, vm, volsm = cpm.lote(sl, ix, gts)

    np.testing.assert_array_equal(np.asarray(c0), np.asarray(cm))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(vm))
    for p in PLANES:
        np.testing.assert_array_equal(np.asarray(vols0[p]), np.asarray(volsm[p]))


def test_lote_multimodal_per_plane_counts_matches_per_patient():
    """The serving-knee product path (VERDICT r3 #4): lote with modality
    dicts + per_plane_counts — what the multi-patient --rapido path uses —
    equals the per-patient fused calls bitwise."""
    model, variables, slices, idx, gt = _setup()
    multi = {p: {"T1": slices[p], "FLAIR": jnp.flip(slices[p], axis=1)} for p in PLANES}
    multi2 = {p: {m: jnp.flip(v, axis=2) for m, v in multi[p].items()} for p in PLANES}

    cp = ConsensusPredictor(
        model, variables, VOL_SHAPE, mejora="GC", imgsz=IMGSZ,
        per_plane_counts=True,
    )
    counts_a, cons_a, vols_a = cp(multi, idx, gt)
    counts_b, cons_b, vols_b = cp(multi2, idx, gt)

    sl = {
        p: {m: jnp.stack([multi[p][m], multi2[p][m]]) for m in multi[p]}
        for p in PLANES
    }
    ix = {p: jnp.stack([idx[p], idx[p]]) for p in PLANES}
    gts = jnp.stack([gt, gt])
    counts, cons, vols = cp.lote(sl, ix, gts)

    assert set(counts) == set(PLANES) | {"consenso"}
    for key in counts:
        np.testing.assert_array_equal(np.asarray(counts[key][0]), np.asarray(counts_a[key]))
        np.testing.assert_array_equal(np.asarray(counts[key][1]), np.asarray(counts_b[key]))
    np.testing.assert_array_equal(np.asarray(cons[0]), np.asarray(cons_a))
    np.testing.assert_array_equal(np.asarray(cons[1]), np.asarray(cons_b))
    for p in PLANES:
        np.testing.assert_array_equal(np.asarray(vols[p][0]), np.asarray(vols_a[p]))
        np.testing.assert_array_equal(np.asarray(vols[p][1]), np.asarray(vols_b[p]))


def test_lote_oob_padding_matches_unpadded():
    """Grouping patients with different slice counts pads the short ones
    with OOB scatter indices (same trick as the mesh path): the padded
    patient's counts/volumes must equal its individual unpadded call."""
    model, variables, slices, idx, gt = _setup()
    cp = ConsensusPredictor(model, variables, VOL_SHAPE, mejora="GC", imgsz=IMGSZ)

    # patient b serves only the first N-1 slices
    slices_b = {p: slices[p][:-1] for p in PLANES}
    idx_b = {p: idx[p][:-1] for p in PLANES}
    counts_a, cons_a, _ = cp(slices, idx, gt)
    counts_b, cons_b, _ = cp(slices_b, idx_b, gt)

    oob = max(VOL_SHAPE)
    sl = {
        p: jnp.stack([slices[p], jnp.pad(slices_b[p], ((0, 1), (0, 0), (0, 0)))])
        for p in PLANES
    }
    ix = {
        p: jnp.stack([idx[p], jnp.pad(idx_b[p], (0, 1), constant_values=oob)])
        for p in PLANES
    }
    counts, cons, _ = cp.lote(sl, ix, jnp.stack([gt, gt]))
    np.testing.assert_array_equal(np.asarray(counts[0]), np.asarray(counts_a))
    np.testing.assert_array_equal(np.asarray(counts[1]), np.asarray(counts_b))
    np.testing.assert_array_equal(np.asarray(cons[1]), np.asarray(cons_b))


def test_multimodal_union_matches_per_modality_or():
    """The n_mod>1 dict path (the CLI's default --modalidad T1 T2 FLAIR):
    the fused multimodal program's per-plane volume equals the OR of the
    single-modality programs' volumes — the stage chain's multimodal
    union semantics (generar_predicciones's per-modality loop)."""
    rng = np.random.default_rng(3)
    vol_a = rng.normal(500, 150, VOL_SHAPE).astype(np.float32)
    vol_b = rng.normal(480, 160, VOL_SHAPE).astype(np.float32)
    gt = np.zeros(VOL_SHAPE, np.float32)
    gt[8:14, 10:18, 9:15] = 1
    model, _ = create_model(nc=1, scale="n")
    variables = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, IMGSZ, IMGSZ, 3)), train=False
    )
    ids = np.arange(5, 5 + N)
    multi, idx = {}, {}
    for p in PLANES:
        idx[p] = jnp.asarray(ids)
        multi[p] = {
            "T1": jnp.asarray(geometry.extract_slices(vol_a, p, ids)),
            "FLAIR": jnp.asarray(geometry.extract_slices(vol_b, p, ids)),
        }

    cp = ConsensusPredictor(
        model, variables, VOL_SHAPE, mejora="GC", imgsz=IMGSZ, umbral=2
    )
    counts_m, cons_m, vols_m = cp(multi, idx, jnp.asarray(gt))

    # reference: one single-modality fused run per modality, volumes OR'd
    vols_by_mod = []
    for mod in ("T1", "FLAIR"):
        single = {p: multi[p][mod] for p in PLANES}
        _, _, v = cp(single, idx, jnp.asarray(gt))
        vols_by_mod.append(v)
    for p in PLANES:
        expect = np.maximum(
            np.asarray(vols_by_mod[0][p]), np.asarray(vols_by_mod[1][p])
        )
        np.testing.assert_array_equal(np.asarray(vols_m[p]), expect)

    # consensus + counts are the vote/confusion of the unioned volumes
    unioned = [
        np.maximum(np.asarray(vols_by_mod[0][p]), np.asarray(vols_by_mod[1][p]))
        for p in PLANES
    ]
    expect_cons = consensus_vote(*unioned, umbral=2)
    np.testing.assert_array_equal(np.asarray(cons_m), np.asarray(expect_cons))
    m = mx.metrics_from_counts(np.asarray(counts_m))
    assert all(np.isfinite(v) for v in m.values())
