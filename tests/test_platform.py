"""utils/platform.on_tpu: the one shared TPU-vs-CPU routing answer.

Regression for the driver's combined entry()+dryrun process: once the
TPU backend initializes, jax.config.update("jax_platforms", "cpu") is a
no-op and default_backend() keeps reporting "tpu" — but the dryrun body
runs under jax.default_device(cpu), so compiled-mode pallas_call would
die with "Only interpret mode is supported on CPU backend".  on_tpu()
must let the active default-device scope win.
"""

import jax

from facedeform_tpu.utils import platform


def test_on_tpu_trusts_backend_without_scope(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert platform.on_tpu() is True
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert platform.on_tpu() is False


def test_on_tpu_default_device_scope_wins(monkeypatch):
    # simulate the wedged state: backend says tpu, scope pins cpu
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with jax.default_device(jax.devices("cpu")[0]):
        assert platform.on_tpu() is False
    assert platform.on_tpu() is True  # scope exit restores backend answer
