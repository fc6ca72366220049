"""Checkpoint save/restore roundtrip incl. data-order resume state."""

import jax.numpy as jnp
import numpy as np
import pytest

from more4d_tpu.train.checkpoint import CheckpointManager


def test_checkpoint_roundtrip(tmp_path):
    params = {"w": jnp.arange(12.0).reshape(3, 4), "b": jnp.ones((4,))}
    opt = {"mu": jnp.zeros((3, 4))}
    extra = {"global_step": 7, "sampler": {"epoch": 1, "pos_start": 42,
                                           "seed": 0}}
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    mgr.save(7, params, opt_state=opt, extra=extra)
    assert mgr.latest_step() == 7

    like_p = {"w": jnp.zeros((3, 4)), "b": jnp.zeros((4,))}
    like_o = {"mu": jnp.zeros((3, 4))}
    out = mgr.restore(params_like=like_p, opt_state_like=like_o,
                      with_extra=True)
    np.testing.assert_array_equal(np.asarray(out["params"]["w"]),
                                  np.arange(12.0).reshape(3, 4))
    assert out["extra"]["sampler"]["pos_start"] == 42
    mgr.close()


def test_load_wan_dit_accepts_orbax_dir(tmp_path):
    """A fine-tune checkpoint written by OUR trainers (orbax dir) loads
    straight through load_wan_dit — the infer CLI's --control_ckpt/
    --inp_ckpt path — with no torch conversion."""
    import jax

    from more4d_tpu.config import dit_tiny
    from more4d_tpu.convert.dit_torch import load_wan_dit
    from more4d_tpu.models import WanDiT

    cfg = dit_tiny(dtype=jnp.float32, in_dim=12, out_dim=4, dim=32,
                   ffn_dim=64, num_heads=2, num_layers=2, text_dim=16,
                   clip_dim=16, text_len=8, motion_guidance=False)
    dit = WanDiT(cfg)
    params = dit.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 2, 4, 4, 4), jnp.float32),
                      jnp.zeros((1,), jnp.float32),
                      jnp.zeros((1, 8, 16), jnp.float32),
                      y=jnp.zeros((1, 2, 4, 4, 8), jnp.float32))
    ema = jax.tree_util.tree_map(lambda x: x + 1.0, params)
    d = str(tmp_path / "finetune")
    mgr = CheckpointManager(d)
    mgr.save(100, params, ema=ema, extra={"global_step": 100})
    mgr.close()

    loaded = load_wan_dit(d, cfg)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # --use_ema_params: the EMA tree loads instead (reference validation
    # samples from the EMA dir, train_wan.py:1007-1017)
    loaded_ema = load_wan_dit(d, cfg, prefer_ema=True)
    for a, b in zip(jax.tree_util.tree_leaves(ema),
                    jax.tree_util.tree_leaves(loaded_ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # prefer_ema on an EMA-less checkpoint falls back to params
    d2 = str(tmp_path / "no_ema")
    mgr = CheckpointManager(d2)
    mgr.save(5, params)
    mgr.close()
    loaded2 = load_wan_dit(d2, cfg, prefer_ema=True)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(loaded2)[0]),
        np.asarray(jax.tree_util.tree_leaves(params)[0]))


def test_checkpoint_rotation(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    for s in (1, 2, 3):
        mgr.save(s, {"x": jnp.full((2,), float(s))})
    assert mgr.latest_step() == 3
    # max_to_keep=2 -> step 1 rotated away (checkpoints_total_limit analog,
    # train_wan.py:2028-2052)
    steps = mgr._mgr.all_steps()
    assert 1 not in steps and set(steps) == {2, 3}
    mgr.close()
