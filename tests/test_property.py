"""Property-based tests (hypothesis): WAV round-trips and snippet-index
invariants hold for arbitrary shapes/rates, not just the handpicked cases."""

import numpy as np
from hypothesis import given, settings, strategies as st

from cpc_tpu.data.wavio import read_wav, write_wav


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=5000),
    channels=st.integers(min_value=1, max_value=4),
    sr=st.sampled_from([8000, 16000, 22050, 44100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_roundtrip_property(tmp_path_factory, n, channels, sr, seed):
    rng = np.random.default_rng(seed)
    x = np.clip(rng.standard_normal((n, channels)) * 0.3, -0.99,
                0.99).astype(np.float32)
    p = str(tmp_path_factory.mktemp("wavprop") / "t.wav")
    write_wav(p, x, sr)
    y, sr2 = read_wav(p)
    assert sr2 == sr
    assert y.shape == (n, channels)
    np.testing.assert_allclose(y, x, atol=2.0 / 32768)


@settings(max_examples=50, deadline=None)
@given(
    file_len=st.integers(min_value=1, max_value=100_000),
    snippet=st.integers(min_value=1, max_value=30_000),
    stride=st.integers(min_value=1, max_value=30_000),
)
def test_snippet_count_invariants(file_len, snippet, stride):
    # mirror of SnippetDataset's per-file arithmetic (SURVEY.md §4.4)
    cnt = 0 if file_len < snippet else 1 + (file_len - snippet) // stride
    if cnt > 0:
        last_off = (cnt - 1) * stride
        assert last_off + snippet <= file_len          # last snippet fits
        assert last_off + stride + snippet > file_len  # and is maximal
    else:
        assert file_len < snippet
