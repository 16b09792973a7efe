"""Multi-host initialization (core/distributed.py): env-driven
jax.distributed init and process-0 write gating.

SURVEY §2.3 / VERDICT r1 missing #2. True multi-host can't run here, but
the init path is exercised for real in a subprocess with a 1-process
coordinator (the same code path a pod launcher takes), and the write
gates are pinned directly.
"""

import logging
import os
import socket
import subprocess
import sys
import textwrap

import pytest

from tpu_mslesseg.core import distributed


def test_maybe_initialize_noop_single_process(monkeypatch):
    monkeypatch.delenv(distributed.ENV_COORD, raising=False)
    monkeypatch.delenv(distributed.ENV_OPTIN, raising=False)
    assert distributed.maybe_initialize() is False
    assert distributed.is_main_process()
    assert distributed.process_count() == 1


def test_single_process_coordinator_init():
    """Real jax.distributed.initialize() handshake, 1-process cluster, in a
    clean subprocess (init must precede any backend use)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    code = textwrap.dedent(f"""
        import jax
        jax.config.update("jax_platforms", "cpu")
        from tpu_mslesseg.core import distributed
        ok = distributed.maybe_initialize()
        assert ok, "expected distributed init to activate"
        assert jax.process_index() == 0
        assert jax.process_count() == 1
        assert distributed.is_main_process()
        # collectives/jit work under the distributed runtime
        import jax.numpy as jnp
        y = jax.jit(lambda x: (x * 2).sum())(jnp.arange(8.0))
        assert float(y) == 56.0
        distributed.barrier("test")
        distributed.shutdown()
        print("DIST-OK")
    """)
    env = dict(os.environ)
    env[distributed.ENV_COORD] = f"127.0.0.1:{port}"
    env[distributed.ENV_NPROC] = "1"
    env[distributed.ENV_PID] = "0"
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=120,
    )
    assert "DIST-OK" in out.stdout, out.stderr


def test_results_writer_gated_off_main(tmp_path, monkeypatch):
    from tpu_mslesseg.train.trainer import ResultsWriter

    monkeypatch.setattr(distributed, "is_main_process", lambda: False)
    w = ResultsWriter(tmp_path / "results.csv")
    w.write_epoch(1, {"box": 1.0}, {}, {}, 0.01)
    assert not (tmp_path / "results.csv").exists()


def test_log_file_gated_by_proc_id_env(tmp_path, monkeypatch):
    from tpu_mslesseg.pipeline.logging_setup import configure_logging

    root = logging.getLogger()
    before = list(root.handlers)
    try:
        monkeypatch.setenv("TPU_MSLESSEG_PROC_ID", "1")
        configure_logging(log_file=tmp_path / "pipeline.log")
        assert not (tmp_path / "pipeline.log").exists()

        monkeypatch.setenv("TPU_MSLESSEG_PROC_ID", "0")
        configure_logging(log_file=tmp_path / "pipeline.log")
        assert (tmp_path / "pipeline.log").exists()
    finally:
        root.handlers[:] = before
