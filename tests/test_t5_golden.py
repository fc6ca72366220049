"""Golden parity: JAX umT5 encoder vs. the reference WanT5EncoderModel."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from more4d_tpu.config import T5Config  # noqa: E402
from more4d_tpu.models.t5 import WanT5Encoder, convert_t5_state_dict
from _ref_loader import load_reference_module  # noqa: E402


@pytest.fixture(scope="module")
def ref_mod():
    return load_reference_module("MoRe4D/models/wan_text_encoder.py",
                                 "ref_wan_text_encoder")


@pytest.mark.parametrize("shared_pos", [False, True])
def test_t5_encoder_golden(ref_mod, shared_pos):
    torch.manual_seed(0)
    cfg = T5Config(vocab=96, dim=32, dim_attn=32, dim_ffn=48, num_heads=2,
                   num_layers=2, num_buckets=8, shared_pos=shared_pos,
                   dtype=jnp.float32)
    ref = ref_mod.WanT5EncoderModel(
        vocab=cfg.vocab, dim=cfg.dim, dim_attn=cfg.dim_attn,
        dim_ffn=cfg.dim_ffn, num_heads=cfg.num_heads,
        num_layers=cfg.num_layers, num_buckets=cfg.num_buckets,
        shared_pos=cfg.shared_pos, dropout=0.0)
    ref.eval()

    rng = np.random.RandomState(0)
    ids = rng.randint(0, cfg.vocab, (2, 11))
    mask = np.ones((2, 11), np.int64)
    mask[0, 7:] = 0

    with torch.no_grad():
        out_ref = ref(torch.from_numpy(ids),
                      torch.from_numpy(mask))[0].numpy()

    model = WanT5Encoder(cfg)
    params = convert_t5_state_dict(ref.state_dict(), cfg)
    out = np.asarray(model.apply(params, jnp.asarray(ids),
                                 jnp.asarray(mask)))
    np.testing.assert_allclose(out, out_ref, rtol=1e-4, atol=1e-4)


def test_bucket_function_matches_reference(ref_mod):
    ref_emb = ref_mod.T5RelativeEmbedding(num_buckets=32, num_heads=1,
                                          bidirectional=True)
    rel_pos = torch.arange(40)[None, :] - torch.arange(40)[:, None]
    ref_buckets = ref_emb._relative_position_bucket(rel_pos).numpy()

    from more4d_tpu.models.t5 import relative_position_buckets
    ours = relative_position_buckets(40, 40, 32, True)
    np.testing.assert_array_equal(ours, ref_buckets)
