import pytest

from zebrapose_tpu.config import ZebraConfig, parse_cfg

_SAMPLE = """\
#### training dataset
bop_challange = True
bop_path = /data/bop/
dataset_name = lmo
second_dataset_ratio = 0.75
train_obj_visible_theshold = 0.2
BoundingBox_CropSize_image = 256
BinaryCode_Loss_Type = BCE
mask_binary_code_loss = True
use_histgramm_weighted_binary_loss = True
learning_rate = 0.0002
batch_size = 32
total_iteration = 380000
padding_ratio = 1.5
resize_method = crop_square_resize
divide_number_each_itration = 2
number_of_itration = 16
"""


def test_parse_cfg_reference_coercions(tmp_path):
    p = tmp_path / "cfg.txt"
    p.write_text(_SAMPLE)
    d = parse_cfg(str(p))
    assert d["bop_challange"] is True
    assert d["batch_size"] == 32 and isinstance(d["batch_size"], int)
    assert d["learning_rate"] == pytest.approx(2e-4)
    assert isinstance(d["second_dataset_ratio"], float)
    assert d["resize_method"] == "crop_square_resize"


def test_dataclass_overlay(tmp_path):
    p = tmp_path / "cfg.txt"
    p.write_text(_SAMPLE + "some_unknown_key = 7\n")
    cfg = ZebraConfig.from_file(str(p))
    assert cfg.total_classes == 65536
    assert cfg.binary_code_length == 16
    assert cfg.extras["some_unknown_key"] == 7
    # defaults fill unspecified keys
    assert cfg.binary_loss_weight == 3.0


def test_validation_rejects_bad_loss():
    with pytest.raises(ValueError):
        ZebraConfig.from_dict({"BinaryCode_Loss_Type": "XX"})
    with pytest.raises(ValueError):
        ZebraConfig.from_dict({"BinaryCode_Loss_Type": "L1",
                               "use_histgramm_weighted_binary_loss": True})


def test_parses_shipped_reference_config():
    # the reference tree is mounted read-only; its configs must load
    d = parse_cfg(
        "/root/reference/zebrapose/config/config_BOP/lmo/exp_lmo_BOP.txt")
    cfg = ZebraConfig.from_dict(d)
    assert cfg.number_of_itration == 16
    assert cfg.use_histgramm_weighted_binary_loss
    assert cfg.padding_ratio == 1.5
