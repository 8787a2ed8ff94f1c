import numpy as np
import pytest

from mica_tpu.utils.parity import compare_with_torch_reference, dice, mask_dice_report


def test_dice():
    a = np.zeros((4, 4), bool)
    b = np.zeros((4, 4), bool)
    assert dice(a, b) == 1.0
    a[0, 0] = True
    assert dice(a, b) == 0.0
    b[0, 0] = True
    assert dice(a, b) == 1.0
    b[1, 1] = True
    assert dice(a, b) == pytest.approx(2 / 3)


def test_mask_dice_report(rng):
    vols = {
        "backbone_probability": rng.random((8, 8, 8)),
        "carbon_alpha_probability": rng.random((8, 8, 8)),
        "amino_acid_prediction": rng.integers(0, 20, (8, 8, 8)),
    }
    rep = mask_dice_report(vols, vols)
    assert rep["backbone_dice"] == 1.0
    assert rep["amino_acid_agreement"] == 1.0
    assert rep["min_dice"] == 1.0


def test_compare_with_torch_reference():
    import pathlib

    if not pathlib.Path("/root/reference/models/model.py").exists():
        pytest.skip("reference snapshot not available")
    pytest.importorskip("torch")
    rep = compare_with_torch_reference(None, "/root/reference", n_windows=2)
    assert rep["bb_max_dev"] < 5e-4, rep
    assert rep["ca_max_dev"] < 5e-4, rep
    assert rep["aa_max_dev"] < 5e-4, rep


def test_checkpoint_roundtrip(tmp_path):
    import jax

    from mica_tpu.train import data as data_mod
    from mica_tpu.train.trainer import (
        Trainer, load_checkpoint, save_checkpoint,
    )

    trainer = Trainer(base_filters=16, use_mesh=False, use_augmentation=False)
    state = trainer.init_state((1, 8, 8, 8, 1))
    save_checkpoint(str(tmp_path / "ck"), state, trainer.scheduler, epoch=3,
                    val_loss=1.25)
    ck = load_checkpoint(str(tmp_path / "ck"))
    assert ck["epoch"] == 3 and ck["val_loss"] == 1.25
    flat1 = jax.tree_util.tree_leaves(state.params)
    flat2 = jax.tree_util.tree_leaves(ck["params"])
    assert len(flat1) == len(flat2)
    np.testing.assert_allclose(np.asarray(flat1[0]), np.asarray(flat2[0]))
    assert ck["scheduler"]["lr"] == trainer.scheduler.lr


def test_checkpoint_resume_restores_optimizer_structure(tmp_path):
    """Full-state resume must restore the optax NAMEDTUPLE optimizer
    state: a structureless orbax restore returns plain dicts, on which
    the lr update (_set_lr -> _replace) and tx.update crash."""
    from mica_tpu.train.trainer import (
        Trainer, _set_lr, load_checkpoint, resume_template, save_checkpoint,
    )

    trainer = Trainer(base_filters=16, use_mesh=False, use_augmentation=False)
    state = trainer.init_state((1, 8, 8, 8, 1))
    save_checkpoint(str(tmp_path / "ck"), state, trainer.scheduler, epoch=1,
                    val_loss=0.5)
    fresh = trainer.init_state((1, 8, 8, 8, 1))
    ck = load_checkpoint(str(tmp_path / "ck"),
                         target=resume_template(fresh, trainer.scheduler))
    # structure restored: the lr injection works on it
    new_opt = _set_lr(ck["opt_state"], 5e-5)
    assert float(new_opt.hyperparams["learning_rate"]) == np.float32(5e-5)
    assert int(ck["step"]) == int(state.step)
    assert np.asarray(ck["grad_norms"]).shape == np.asarray(state.grad_norms).shape
