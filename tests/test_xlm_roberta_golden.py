"""Golden parity: JAX XLM-RoBERTa vs. the reference torch model."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from more4d_tpu.models.xlm_roberta import (XLMRoberta,
                                           convert_xlm_roberta_state_dict)
from _ref_loader import load_reference_module  # noqa: E402


def test_xlm_roberta_golden():
    ref_mod = load_reference_module("MoRe4D/models/wan_xlm_roberta.py",
                                    "ref_wan_xlm_roberta")
    torch.manual_seed(0)
    kw = dict(vocab_size=64, max_seq_len=32, type_size=1, pad_id=1, dim=32,
              num_heads=2, num_layers=2, post_norm=True, dropout=0.0)
    ref = ref_mod.XLMRoberta(**kw)
    ref.eval()

    rng = np.random.RandomState(0)
    ids = rng.randint(2, 64, (2, 11))
    ids[0, 7:] = 1  # padding
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(ids)).numpy()

    model = XLMRoberta(vocab_size=64, max_seq_len=32, dim=32, num_heads=2,
                       num_layers=2)
    params = convert_xlm_roberta_state_dict(ref.state_dict(), num_layers=2)
    out = np.asarray(model.apply(params, jnp.asarray(ids)))
    np.testing.assert_allclose(out, out_ref, rtol=2e-4, atol=2e-4)
