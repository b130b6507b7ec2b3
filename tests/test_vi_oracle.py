"""VI accuracy parity vs the in-repo torch oracle (the reference's
training loop, tools/vi_torch_oracle.py): identical crops, identical
budget (Adam 1e-4, CE, batch 128) -> the flax VITrainer must reach
the torch reference's validation accuracy. BASELINE's 0.5% clause is
measured at the full budget by running the tool as a script
(multi-seed mean, recorded in docs/PARITY.md); this reduced-budget CI
assertion runs at a saturating operating point where the binomial
noise of the small validation set cannot mask a real regression."""
import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

TOOLS = Path(__file__).resolve().parents[1] / "tools"


def _oracle():
    spec = importlib.util.spec_from_file_location(
        "vi_torch_oracle", TOOLS / "vi_torch_oracle.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_flax_matches_torch_reference_budget():
    o = _oracle()
    images, labels = o.make_identity_dataset(
        n_ids=8, per_id=100, size=32, noise=6.0, max_angle=1.0)
    tr_x, tr_y, va_x, va_y = o.split(images, labels)
    t_acc = o.train_torch_reference(tr_x, tr_y, va_x, va_y, 8,
                                    epochs=12, batch_size=32, seed=0)
    f_acc = o.train_flax(tr_x, tr_y, va_x, va_y, 8, epochs=12,
                         batch_size=32, seed=0)
    # saturating operating point: both loops must solve it, and the
    # flax trainer must not trail the reference loop by more than the
    # validation set's binomial noise floor (n=160 at p~0.98 ->
    # sigma ~ 1.1%; bound at ~3 sigma)
    assert t_acc >= 0.95, f"torch oracle failed to converge: {t_acc}"
    assert f_acc >= 0.95, f"flax trainer failed to converge: {f_acc}"
    assert f_acc >= t_acc - 0.035, (f_acc, t_acc)
