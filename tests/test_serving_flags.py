"""Serving-only TPU flag deployment (VERDICT r4 #1).

The round-4 sweep measured scoped VMEM 64 MiB as +3.3% on the fused
serving program but −5% on the b=128 train step, and libtpu reads
LIBTPU_INIT_ARGS once at plugin init — so the flag must be exported
iff the invocation cannot train, BEFORE the first device op. These
tests pin:

* the helper itself (env-dict semantics, idempotence, opt-out,
  user-setting respect) — the single implementation bench.py and the
  product entries share;
* the serving-only decision (`invocacion_solo_servicio`) mirroring the
  orchestrator's actual training condition;
* the CLI wiring: `ejecutar_pipeline.main` sets the flag iff
  serving-only; the standalone prediction stage always sets it;
* the `--rapido` default resolution (`resolver_rapido`).
"""

import os

import pytest

from tpu_mslesseg.infer.consensus3 import set_serving_tpu_flags
from tpu_mslesseg.pipeline import ejecutar_pipeline as orch

FLAG = "--xla_tpu_scoped_vmem_limit_kib"
FLAGS = f"{FLAG}=65536 --xla_tpu_rwb_fusion=false"


# ---------------------------------------------------------------- helper

def test_helper_sets_flags_in_env_dict():
    env = {}
    assert set_serving_tpu_flags(env=env) is True
    assert env["LIBTPU_INIT_ARGS"] == FLAGS


def test_helper_appends_to_existing_args():
    env = {"LIBTPU_INIT_ARGS": "--foo=1"}
    assert set_serving_tpu_flags(env=env) is True
    assert env["LIBTPU_INIT_ARGS"] == f"--foo=1 {FLAGS}"


def test_helper_respects_user_scoped_vmem_setting():
    # user-managed knob with a NON-measured value: untouched, and the
    # helper reports False so bench never labels it serving_vmem_flag
    env = {"LIBTPU_INIT_ARGS": f"{FLAG}=32768"}
    assert set_serving_tpu_flags(env=env) is False
    assert env["LIBTPU_INIT_ARGS"] == f"{FLAG}=32768"


def test_helper_respects_user_rwb_setting():
    env = {"LIBTPU_INIT_ARGS": "--xla_tpu_rwb_fusion=true"}
    assert set_serving_tpu_flags(env=env) is False  # untouched, not ours
    assert env["LIBTPU_INIT_ARGS"] == "--xla_tpu_rwb_fusion=true"


def test_helper_true_when_user_env_matches_measured_config():
    env = {"LIBTPU_INIT_ARGS": FLAGS}
    assert set_serving_tpu_flags(env=env) is True  # measured config runs
    assert env["LIBTPU_INIT_ARGS"] == FLAGS


def test_helper_opt_out():
    env = {"TPU_MSLESSEG_NO_TPU_FLAGS": "1"}
    assert set_serving_tpu_flags(env=env) is False
    assert "LIBTPU_INIT_ARGS" not in env


def test_helper_idempotent():
    env = {}
    set_serving_tpu_flags(env=env)
    once = env["LIBTPU_INIT_ARGS"]
    set_serving_tpu_flags(env=env)
    assert env["LIBTPU_INIT_ARGS"] == once


# ------------------------------------------------- serving-only decision

def _args(**kw):
    import argparse

    base = dict(
        plano="axial", modalidad=["FLAIR"], num_cortes=50, mejora=None,
        epochs=50, k_folds=5, umbral_consenso=2, completo=False,
        paciente_id=None, entrenar=False, train_secuencial=False,
        limpiar=False, rapido=False, sin_rapido=False,
    )
    base.update(kw)
    return argparse.Namespace(**base)


def _modelo():
    from tpu_mslesseg.pipeline.modelo import Modelo

    return Modelo(plano="axial", num_cortes=50, modalidad=["FLAIR"], k_folds=5)


def test_no_entrenar_is_serving_only():
    assert orch.invocacion_solo_servicio(_args(completo=True), _modelo())


def test_entrenar_with_untrained_folds_is_not_serving_only(monkeypatch):
    monkeypatch.setattr(orch, "existe_modelo_entrenado", lambda *a, **k: False)
    assert not orch.invocacion_solo_servicio(
        _args(completo=True, entrenar=True), _modelo()
    )


def test_entrenar_with_all_folds_trained_is_serving_only(monkeypatch):
    monkeypatch.setattr(orch, "existe_modelo_entrenado", lambda *a, **k: True)
    assert orch.invocacion_solo_servicio(
        _args(completo=True, entrenar=True), _modelo()
    )


def test_patient_mode_checks_only_that_patients_fold(monkeypatch):
    """P39 is in fold 4 of 5 (calcular_fold over IDs 1-53): the decision
    must ask about fold 4 only — other folds' training state is
    irrelevant to a patient invocation."""
    from tpu_mslesseg.pipeline.paciente import calcular_fold

    fold_p39 = calcular_fold("P39", 5)
    asked = []

    def fake_existe(modelo, epochs, k):
        asked.append(k)
        return True

    monkeypatch.setattr(orch, "existe_modelo_entrenado", fake_existe)
    assert orch.invocacion_solo_servicio(
        _args(paciente_id="P39", entrenar=True), _modelo()
    )
    assert asked == [fold_p39]


# ------------------------------------------------------- CLI wiring

@pytest.fixture
def clean_flag_env(monkeypatch):
    """Restore LIBTPU_INIT_ARGS after the code under test mutates it."""
    monkeypatch.delenv("LIBTPU_INIT_ARGS", raising=False)
    monkeypatch.delenv("TPU_MSLESSEG_NO_TPU_FLAGS", raising=False)
    yield


def test_main_sets_flag_iff_serving_only(monkeypatch, clean_flag_env):
    """The flag-set-iff-serving-only contract at the real CLI entry."""
    seen = {}

    monkeypatch.setattr(orch, "ejecutar_pipeline",
                        lambda **kw: seen.update(kw))
    monkeypatch.setattr(orch, "configure_logging", lambda **kw: None)
    import tpu_mslesseg.core.distributed as dist

    monkeypatch.setattr(dist, "maybe_initialize", lambda: None)

    argv = ["--plano", "axial", "--modalidad", "FLAIR",
            "--num_cortes", "50", "--completo"]

    # serving-only invocation (no --entrenar): flag exported
    orch.main(argv)
    assert FLAG in os.environ.get("LIBTPU_INIT_ARGS", "")
    assert seen["rapido"] is True  # --completo default (resolver_rapido)

    # trainable invocation (untrained folds): flag NOT exported
    monkeypatch.delenv("LIBTPU_INIT_ARGS", raising=False)
    monkeypatch.setattr(orch, "existe_modelo_entrenado", lambda *a, **k: False)
    orch.main(argv + ["--entrenar"])
    assert FLAG not in os.environ.get("LIBTPU_INIT_ARGS", "")


def test_prediction_stage_main_sets_flag(monkeypatch, clean_flag_env):
    """The standalone prediction stage never trains: always flagged."""
    from tpu_mslesseg.pipeline.stages import generar_predicciones as gp

    monkeypatch.setattr(gp, "ejecutar_flujo_pred", lambda *a, **k: None)
    gp.main(["--plano", "axial", "--modalidad", "FLAIR",
             "--num_cortes", "50", "--fold_test", "1"])
    assert FLAG in os.environ.get("LIBTPU_INIT_ARGS", "")


# --------------------------------------------------- --rapido resolution

def test_rapido_defaults():
    assert orch.resolver_rapido(_args(completo=True)) is True
    assert orch.resolver_rapido(_args(paciente_id="P39")) is False
    assert orch.resolver_rapido(_args(paciente_id="P39", rapido=True)) is True
    assert orch.resolver_rapido(_args(completo=True, sin_rapido=True)) is False


# ------------------------------------------- SPMD serving mesh gating

def test_serving_mesh_gated_to_single_process(monkeypatch):
    """Multi-host runs must NOT build a serving mesh: jax.devices() is
    the GLOBAL list there, and device_put/device_get on shards living on
    non-addressable devices is invalid — each process serves its own
    patients unsharded instead (rapido._mesh_para_servicio)."""
    import jax

    from tpu_mslesseg.pipeline import rapido

    # single process, multi-device (the 8-device virtual CPU mesh of
    # tests/conftest.py): SPMD serving is on
    if len(jax.devices()) > 1:
        assert rapido._mesh_para_servicio() is not None

    # simulated multi-host: gated off regardless of device count
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    assert rapido._mesh_para_servicio() is None
