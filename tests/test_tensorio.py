"""Native tensorio tests: C++ dtype conversions vs numpy/torch oracles and
the torch-free safetensors reader vs the safetensors library."""

import numpy as np
import pytest

from asvd4llm_tpu.utils.tensorio import (
    SafetensorsFile, bf16_bytes_to_f32, f32_to_bf16_bits,
    load_safetensors_state_dict, native_available,
)


def test_native_built():
    assert native_available(), "run `make -C native` first"


def test_bf16_to_f32_roundtrip():
    rng = np.random.RandomState(0)
    vals = rng.randn(1000).astype(np.float32)
    bits = f32_to_bf16_bits(vals)
    back = bf16_bytes_to_f32(bits)
    # bf16 has 8 mantissa bits -> rel error <= 2^-8
    np.testing.assert_allclose(back, vals, rtol=2 ** -8)


def test_bf16_conversion_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    vals = rng.randn(4096).astype(np.float32) * 100
    ours = f32_to_bf16_bits(vals)
    theirs = torch.from_numpy(vals).to(torch.bfloat16).view(torch.uint16).numpy()
    np.testing.assert_array_equal(ours, theirs)
    # and the decode direction
    ours_back = bf16_bytes_to_f32(theirs)
    theirs_back = torch.from_numpy(vals).to(torch.bfloat16).float().numpy()
    np.testing.assert_array_equal(ours_back, theirs_back)


def test_bf16_nan_inf():
    vals = np.array([np.nan, np.inf, -np.inf, 0.0, -0.0], np.float32)
    back = bf16_bytes_to_f32(f32_to_bf16_bits(vals))
    assert np.isnan(back[0])
    assert back[1] == np.inf and back[2] == -np.inf
    assert back[3] == 0.0 and back[4] == 0.0


@pytest.mark.parametrize("dtype", ["float32", "float16", "bfloat16"])
def test_safetensors_reader_matches_library(tmp_path, dtype):
    torch = pytest.importorskip("torch")
    from safetensors.torch import save_file

    rng = np.random.RandomState(2)
    tensors = {
        "a.weight": torch.from_numpy(rng.randn(33, 65).astype(np.float32)),
        "b.bias": torch.from_numpy(rng.randn(7).astype(np.float32)),
        "c.ids": torch.arange(12, dtype=torch.int64),
    }
    tensors = {k: (v.to(getattr(torch, dtype)) if v.is_floating_point() else v)
               for k, v in tensors.items()}
    path = str(tmp_path / "m.safetensors")
    save_file(tensors, path)

    with SafetensorsFile(path) as f:
        assert set(f.keys()) == set(tensors)
        for k, v in tensors.items():
            ours = f.tensor(k, to_f32=True)
            ref = v.float().numpy() if v.is_floating_point() else v.numpy()
            np.testing.assert_array_equal(ours, ref)


def test_load_state_dict_dir(tmp_path):
    torch = pytest.importorskip("torch")
    from safetensors.torch import save_file

    save_file({"x": torch.ones(3, 4)}, str(tmp_path / "a.safetensors"))
    save_file({"y": torch.zeros(2)}, str(tmp_path / "b.safetensors"))
    sd = load_safetensors_state_dict(str(tmp_path))
    assert set(sd) == {"x", "y"}
    assert sd["x"].shape == (3, 4)
    with pytest.raises(FileNotFoundError):
        load_safetensors_state_dict(str(tmp_path / "nope"))


def test_load_model_native_matches_torch_loader(tmp_path):
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from asvd4llm_tpu.utils.testing import build_tiny_checkpoint
    from asvd4llm_tpu.models.loader import load_model, load_model_native
    from asvd4llm_tpu.models import forward

    path = str(tmp_path / "ckpt")
    build_tiny_checkpoint(path, "llama", hidden=32, layers=1, heads=2)
    p_t, spec_t, _ = load_model(path, dtype=jnp.float32)
    p_n, spec_n = load_model_native(path, dtype=jnp.float32)
    assert spec_t == spec_n
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 64, (1, 8)))
    np.testing.assert_allclose(np.asarray(forward(p_n, ids, spec_n)),
                               np.asarray(forward(p_t, ids, spec_t)),
                               atol=1e-5)


def test_reader_rejects_out_of_range_offsets(tmp_path):
    """Untrusted header offsets must be bound-checked before any copy
    (round-1 advisor finding: truncated/malicious files caused OOB reads)."""
    import json
    import struct

    def write_st(path, header, payload):
        hdr = json.dumps(header).encode()
        with open(path, "wb") as f:
            f.write(struct.pack("<Q", len(hdr)))
            f.write(hdr)
            f.write(payload)

    # 1) tensor range past end of file (truncated payload)
    p1 = str(tmp_path / "trunc.safetensors")
    write_st(p1, {"w": {"dtype": "F32", "shape": [4, 4],
                        "data_offsets": [0, 64]}}, b"\x00" * 8)
    with SafetensorsFile(p1) as f:
        with pytest.raises(ValueError):
            f.tensor("w")

    # 2) inverted / negative offsets
    p2 = str(tmp_path / "bad.safetensors")
    write_st(p2, {"w": {"dtype": "F32", "shape": [1],
                        "data_offsets": [8, 4]}}, b"\x00" * 16)
    with SafetensorsFile(p2) as f:
        with pytest.raises(ValueError):
            f.tensor("w")

    # 3) byte range inconsistent with shape*itemsize
    p3 = str(tmp_path / "short.safetensors")
    write_st(p3, {"w": {"dtype": "F32", "shape": [4, 4],
                        "data_offsets": [0, 8]}}, b"\x00" * 8)
    with SafetensorsFile(p3) as f:
        with pytest.raises(ValueError):
            f.tensor("w")

    # 4) header length past end of file
    p4 = str(tmp_path / "hdr.safetensors")
    with open(p4, "wb") as fh:
        fh.write(struct.pack("<Q", 1 << 40))
        fh.write(b"{}")
    with pytest.raises(ValueError):
        SafetensorsFile(p4)
