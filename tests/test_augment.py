import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_mslesseg.train import augment


def naive_bilinear(img, ys, xs, fill):
    """Reference pointwise-gather bilinear sample at outer grid ys x xs."""
    H, W = img.shape
    out = np.full((len(ys), len(xs)), fill, np.float32)
    for a, y in enumerate(ys):
        for b, x in enumerate(xs):
            if y < 0 or y > H - 1 or x < 0 or x > W - 1:
                continue
            y0, x0 = int(np.floor(y)), int(np.floor(x))
            y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
            wy, wx = y - y0, x - x0
            out[a, b] = (
                img[y0, x0] * (1 - wy) * (1 - wx)
                + img[y0, x1] * (1 - wy) * wx
                + img[y1, x0] * wy * (1 - wx)
                + img[y1, x1] * wy * wx
            )
    return out


def test_interp_matrix_matches_naive(rng):
    img = rng.normal(size=(13, 17)).astype(np.float32)
    ys = np.linspace(-2.0, 14.0, 9).astype(np.float32)
    xs = np.linspace(-1.0, 18.0, 11).astype(np.float32)
    Wy, hy = augment._interp_matrix(jnp.asarray(ys), 13)
    Wx, hx = augment._interp_matrix(jnp.asarray(xs), 17)
    got = np.asarray(Wy @ jnp.asarray(img) @ Wx.T)
    hit = np.asarray(hy)[:, None] & np.asarray(hx)[None, :]
    expect = naive_bilinear(img, ys, xs, 0.0)
    np.testing.assert_allclose(np.where(hit, got, 0.0), np.where(hit, expect, 0.0),
                               rtol=1e-5, atol=1e-5)
    # in-bounds mask correct
    np.testing.assert_array_equal(np.asarray(hy), (ys >= 0) & (ys <= 12))


def test_nearest_matrix_exact(rng):
    img = rng.integers(0, 9, (11, 7)).astype(np.float32)
    ys = np.array([0.4, 2.6, 10.4, -0.6, 11.0], np.float32)
    xs = np.array([0.0, 3.49, 6.5], np.float32)
    Ny, ny = augment._nearest_matrix(jnp.asarray(ys), 11)
    Nx, nx = augment._nearest_matrix(jnp.asarray(xs), 7)
    got = np.asarray(Ny @ jnp.asarray(img) @ Nx.T)
    for a, y in enumerate(ys):
        for b, x in enumerate(xs):
            yi, xi = int(np.round(y)), int(np.round(x))
            if 0 <= yi < 11 and 0 <= xi < 7:
                assert got[a, b] == img[yi, xi], (a, b)
            else:
                assert got[a, b] == 0.0


@pytest.fixture(scope="module")
def tiny_dataset(rng):
    M, H, W = 6, 48, 40
    images = rng.integers(0, 255, (M, H, W)).astype(np.uint8)
    instmaps = np.zeros((M, H, W), np.uint8)
    instmaps[:, 10:20, 8:18] = 1
    instmaps[:, 30:38, 25:35] = 2
    boxes = np.zeros((M, 4, 4), np.float32)
    boxes[:, 0] = (8, 10, 18, 20)
    boxes[:, 1] = (25, 30, 35, 38)
    valid = np.zeros((M, 4), bool)
    valid[:, :2] = True
    return {
        "images": jnp.asarray(images),
        "instmaps": jnp.asarray(instmaps),
        "boxes": jnp.asarray(boxes),
        "valid": jnp.asarray(valid),
    }


@pytest.mark.parametrize("mosaic", [True, False])
def test_make_batch_shapes_and_consistency(tiny_dataset, mosaic):
    cfg = augment.AugConfig(imgsz=64, max_inst=4, mosaic=mosaic)
    key = jax.random.PRNGKey(3)
    idx = jax.random.randint(key, (4, 4), 0, 6)
    batch = augment.make_batch(key, tiny_dataset, idx, cfg)
    assert batch["images"].shape == (4, 64, 64, 3)
    assert batch["instmap"].shape == (4, 64, 64)
    assert batch["instmap_proto"].shape == (4, 16, 16)
    assert batch["boxes"].shape == (4, 16, 4)
    assert batch["valid"].shape == (4, 16)
    imgs = np.asarray(batch["images"])
    assert np.isfinite(imgs).all() and imgs.min() >= 0 and imgs.max() <= 1.0

    # every valid transformed box should contain some pixels of its
    # instance in the transformed instmap (nearest-sampled)
    inst = np.asarray(batch["instmap"])
    boxes = np.asarray(batch["boxes"])
    valid = np.asarray(batch["valid"])
    checked = misses = 0
    for b in range(4):
        for i in np.nonzero(valid[b])[0]:
            x1, y1, x2, y2 = boxes[b, i]
            sub = inst[b, int(y1) : int(np.ceil(y2)) + 1, int(x1) : int(np.ceil(x2)) + 1]
            checked += 1
            if not np.any(sub == i + 1):
                misses += 1
    assert checked > 0
    # boxes are transformed analytically while masks resample: allow a
    # small fraction of degenerate clipped leftovers
    assert misses <= max(1, checked // 8), (misses, checked)


def test_val_config_is_deterministic_letterbox(tiny_dataset):
    from tpu_mslesseg.train.validate import val_aug_config

    cfg = val_aug_config(max_inst=4, imgsz=64)
    key = jax.random.PRNGKey(0)
    idx = jnp.zeros((2, 4), jnp.int32)
    b1 = augment.make_batch(key, tiny_dataset, idx, cfg)
    b2 = augment.make_batch(jax.random.PRNGKey(9), tiny_dataset, idx, cfg)
    # different keys, identical output: no randomness in the val path
    np.testing.assert_allclose(np.asarray(b1["images"]), np.asarray(b2["images"]))
    np.testing.assert_array_equal(np.asarray(b1["instmap"]), np.asarray(b2["instmap"]))


def test_mosaic_affine_matches_ultralytics_transcription(rng):
    """Differential parity for the composed augmentation geometry: our
    single-gather-program mosaic+affine+flip+gain vs a literal NumPy
    transcription of upstream Mosaic._mosaic4 + RandomPerspective
    (tests/ultralytics_np.py), with identical injected draws (integer
    mosaic centers — upstream casts them to int). Bilinear/nearest
    blending differs only in a 1-px band at tile seams (upstream blends
    across the pasted canvas; we sample per tile), so equality is
    asserted off-seam and the on-seam mismatch fraction is bounded."""
    import ultralytics_np as unp
    from tpu_mslesseg.train.augment import _AugParams, _apply_mosaic

    S, I, max_inst = 32, 4, 4
    for trial in range(12):
        H, W = (S, S) if trial % 2 == 0 else (24, 20)
        imgs = rng.integers(0, 255, (4, H, W)).astype(np.float32)
        insts = np.zeros((4, H, W), np.uint8)
        boxes = np.zeros((4, I, 4), np.float32)
        valid = np.zeros((4, I), bool)
        for k in range(4):
            for i in range(rng.integers(1, I + 1)):
                x1 = rng.integers(0, W - 8); y1 = rng.integers(0, H - 8)
                x2 = x1 + rng.integers(5, min(16, W - x1))
                y2 = y1 + rng.integers(5, min(16, H - y1))
                insts[k, y1:y2, x1:x2] = i + 1
                boxes[k, i] = (x1, y1, x2, y2)
                valid[k, i] = True

        yc = int(rng.integers(S // 2, 3 * S // 2 + 1))
        xc = int(rng.integers(S // 2, 3 * S // 2 + 1))
        s = float(rng.uniform(0.5, 1.5))
        tx = float(rng.uniform(0.4, 0.6)) * S
        ty = float(rng.uniform(0.4, 0.6)) * S
        flip = float(rng.uniform())
        gain = float(rng.uniform(0.6, 1.4))

        cfg = augment.AugConfig(imgsz=S, max_inst=max_inst, mosaic=True)
        p = _AugParams(*(jnp.asarray(v, jnp.float32)
                         for v in (yc, xc, s, tx, ty, flip, gain)))
        img_j, inst_j, box_j, ok_j = jax.jit(
            _apply_mosaic, static_argnames="cfg"
        )(p, jnp.asarray(imgs), jnp.asarray(insts), jnp.asarray(boxes),
          jnp.asarray(valid), cfg)

        img_r, inst_r, box_r, ok_r = unp.mosaic_affine_reference(
            imgs, insts, boxes, valid, yc, xc, s, tx, ty, flip, gain,
            S, max_inst,
        )

        # canvas-coordinate seam band: sample coords within 1px of a tile
        # or canvas boundary (pre-flip output order; flip both masks)
        ys = (np.arange(S) - ty) / s + S
        xs = (np.arange(S) - tx) / s + S
        yb = [0.0, yc - H, yc, yc + H, 2.0 * S]
        xb = [0.0, xc - W, xc, xc + W, 2.0 * S]
        seam_y = np.min(np.abs(ys[:, None] - np.asarray(yb)[None]), 1) <= 1.0
        seam_x = np.min(np.abs(xs[:, None] - np.asarray(xb)[None]), 1) <= 1.0
        seam = seam_y[:, None] | seam_x[None, :]
        if flip < cfg.fliplr:
            seam = seam[:, ::-1]

        img_j = np.asarray(img_j)
        inst_j = np.asarray(inst_j)
        np.testing.assert_allclose(
            img_j[~seam], img_r[~seam], atol=0.25,
            err_msg=f"trial {trial} off-seam image",
        )
        np.testing.assert_array_equal(inst_j[~seam], inst_r[~seam])
        # the seam band itself is a bounded fraction of the frame
        assert seam.mean() < 0.6, (trial, seam.mean())

        np.testing.assert_allclose(
            np.asarray(box_j), box_r, atol=0.02,
            err_msg=f"trial {trial} boxes",
        )
        # candidate filter: compare where the reference criteria are not
        # borderline (f32 vs f64 could flip an exact-threshold case)
        w2 = box_r[:, 2] - box_r[:, 0]
        h2 = box_r[:, 3] - box_r[:, 1]
        clear = (np.abs(w2 - 2) > 0.05) & (np.abs(h2 - 2) > 0.05)
        np.testing.assert_array_equal(
            np.asarray(ok_j)[clear], ok_r[clear], err_msg=f"trial {trial} valid"
        )
