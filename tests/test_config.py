"""Config validation: unsupported checkpoint knobs must fail loudly."""

import json

import pytest

from deepv_tpu.config import MMDiTConfig


def test_unsupported_knobs_raise():
    with pytest.raises(NotImplementedError, match="qk_norm"):
        MMDiTConfig(qk_norm="layer_norm")
    with pytest.raises(NotImplementedError, match="pos_embed_type"):
        MMDiTConfig(pos_embed_type="rope")
    with pytest.raises(NotImplementedError, match="temp_pos_embed_type"):
        MMDiTConfig(temp_pos_embed_type="sincos")
    with pytest.raises(NotImplementedError, match="use_temporal_causal"):
        MMDiTConfig(use_temporal_causal=False)


def test_from_json_rejects_unsupported_and_ignores_unknown(tmp_path):
    p = tmp_path / "config.json"
    # unknown keys (e.g. the reference's max_num_frames / diffusers _class_name)
    # are dropped; supported keys are honoured
    p.write_text(json.dumps({"num_layers": 2, "max_num_frames": 200,
                             "_class_name": "MMDiT"}))
    cfg = MMDiTConfig.from_json(str(p))
    assert cfg.num_layers == 2

    p.write_text(json.dumps({"num_layers": 2, "pos_embed_type": "rope"}))
    with pytest.raises(NotImplementedError):
        MMDiTConfig.from_json(str(p))
