"""Checkpoint atomicity + ResultsWriter resume semantics."""

import csv

import numpy as np

from tpu_mslesseg.train import checkpoint
from tpu_mslesseg.train.trainer import ResultsWriter


class _State:
    params = {"w": np.ones((4, 4), np.float32)}
    batch_stats = {"m": np.zeros((4,), np.float32)}
    ema_params = {"w": np.full((4, 4), 2.0, np.float32)}
    step = np.int32(7)
    opt_state = ()


def test_checkpoint_roundtrip_and_no_tmp_left(tmp_path):
    path = tmp_path / "best.ckpt"
    checkpoint.save_checkpoint(path, _State)
    assert checkpoint.checkpoint_exists(path)
    assert not (tmp_path / "best.ckpt.tmp").exists()
    ck = checkpoint.load_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(ck["params"]["w"]), _State.params["w"])
    np.testing.assert_array_equal(
        np.asarray(ck["ema_params"]["w"]), _State.ema_params["w"]
    )
    assert int(ck["step"]) == 7

    # overwrite keeps working (old dir swapped out)
    class S2(_State):
        step = np.int32(9)

    checkpoint.save_checkpoint(path, S2)
    assert int(checkpoint.load_checkpoint(path)["step"]) == 9


def test_inference_variables_prefers_ema():
    ck = {
        "params": {"w": 1},
        "ema_params": {"w": 2},
        "batch_stats": {"m": 3},
    }
    v = checkpoint.inference_variables(ck)
    assert v["params"]["w"] == 2
    v = checkpoint.inference_variables(ck, use_ema=False)
    assert v["params"]["w"] == 1


def test_results_writer_append(tmp_path):
    path = tmp_path / "results.csv"
    w = ResultsWriter(path)
    w.write_epoch(1, {"box": 1.0}, {}, {}, 0.01)
    w.write_epoch(2, {"box": 0.9}, {}, {}, 0.01)

    # fresh writer without append truncates
    w2 = ResultsWriter(path)
    with open(path) as f:
        assert len(list(csv.reader(f))) == 1  # header only

    w2.write_epoch(1, {"box": 1.0}, {}, {}, 0.01)
    # resume-style writer keeps rows and continues the clock
    w3 = ResultsWriter(path, append=True)
    w3.write_epoch(2, {"box": 0.8}, {}, {}, 0.005)
    with open(path) as f:
        rows = list(csv.reader(f))
    assert [r[0] for r in rows] == ["epoch", "1", "2"]
    assert float(rows[2][1]) >= float(rows[1][1])  # time monotonic


def test_results_writer_resume_drops_replayed_epochs(tmp_path):
    """Checkpoint every 10 epochs + rows every epoch: resuming from epoch
    21 must drop rows 21+ so replayed epochs don't duplicate."""
    path = tmp_path / "results.csv"
    w = ResultsWriter(path)
    for e in range(1, 28):
        w.write_epoch(e, {"box": 1.0}, {}, {}, 0.01)
    w2 = ResultsWriter(path, append=True, from_epoch=21)
    for e in range(21, 31):
        w2.write_epoch(e, {"box": 0.5}, {}, {}, 0.01)
    with open(path) as f:
        epochs = [r[0] for r in list(csv.reader(f))[1:]]
    assert epochs == [str(e) for e in range(1, 31)]


def test_compat_restore_of_pre_grad_accum_checkpoint(tmp_path):
    """A last.ckpt saved before gradient accumulation existed has no
    'grad_accum' entry; a strict template restore raises and the engine's
    except would silently RESTART training (rewriting results.csv and
    clobbering best.ckpt). load_checkpoint_compat must restore the old
    keys and fill grad_accum from the template instead."""
    import pytest

    path = tmp_path / "last.ckpt"

    class Old(_State):  # pre-accumulation state: no grad_accum attribute
        opt_state = {"mu": np.full((4, 4), 0.5, np.float32)}

    checkpoint.save_checkpoint(path, Old, include_opt=True)

    zeros = {"w": np.zeros((4, 4), np.float32)}
    template = {
        "params": Old.params,
        "batch_stats": Old.batch_stats,
        "ema_params": Old.ema_params,
        "opt_state": Old.opt_state,
        "step": np.asarray(Old.step),
        "grad_accum": zeros,
    }
    # the strict restore indeed fails on the extra key (the bug's trigger)
    with pytest.raises(Exception):
        checkpoint.load_checkpoint(path, template)

    restored = checkpoint.load_checkpoint_compat(path, template)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  Old.params["w"])
    np.testing.assert_array_equal(np.asarray(restored["opt_state"]["mu"]),
                                  Old.opt_state["mu"])
    assert int(restored["step"]) == 7
    np.testing.assert_array_equal(np.asarray(restored["grad_accum"]["w"]),
                                  zeros["w"])

    # a genuinely mismatched template (no optional key involved) still raises
    bad = {k: v for k, v in template.items() if k != "grad_accum"}
    bad["params"] = {"nope": np.zeros((2,), np.float32)}
    with pytest.raises(Exception):
        checkpoint.load_checkpoint_compat(path, bad)


def test_load_stopper_state_paths(tmp_path):
    """Resume stopper-state corner cases: fresh run, full note, legacy
    note without best_epoch, and the epsilon floor for a best.ckpt whose
    fitness note is missing (0.0 would let zero-fitness ties demote it)."""
    import json

    from tpu_mslesseg.train.checkpoint import load_stopper_state

    w = tmp_path / "weights"
    w.mkdir()
    # fresh run (start_epoch == 1): sentinel fitness, no stop pressure
    assert load_stopper_state(w, 1) == (-1.0, 0)
    # resume without any note or best.ckpt: same sentinel
    assert load_stopper_state(w, 8) == (-1.0, 7)
    # best.ckpt present but note missing: epsilon floor, NOT 0.0
    (w / "best.ckpt").mkdir()
    (w / "best.ckpt" / "x").write_text("d")
    bf, be = load_stopper_state(w, 8)
    assert 0.0 < bf < 1e-9 and be == 7
    # legacy note without best_epoch
    (w / "fitness.json").write_text(json.dumps({"best_fitness": 0.73000001}))
    assert load_stopper_state(w, 8) == (0.73000001, 7)
    # full note wins
    (w / "fitness.json").write_text(
        json.dumps({"best_fitness": 0.5, "best_epoch": 3})
    )
    assert load_stopper_state(w, 8) == (0.5, 3)
    # corrupt note falls back to the epsilon floor (best.ckpt exists)
    (w / "fitness.json").write_text("{not json")
    bf, be = load_stopper_state(w, 8)
    assert 0.0 < bf < 1e-9 and be == 7
