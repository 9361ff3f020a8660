"""TensorBoard event writer + logging/observability wiring (VERDICT r1 #10)."""

import struct
from pathlib import Path

import numpy as np
import pytest

from pistoseg_tpu.core.logging import MetricsLogger, snapshot_code
from pistoseg_tpu.core.tboard import SummaryWriter, _crc32c, _masked_crc


def test_crc32c_vectors():
    # canonical Castagnoli test vectors
    assert _crc32c(b"") == 0
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA


def _walk_records(path: Path):
    data = path.read_bytes()
    off = 0
    while off < len(data):
        (ln,) = struct.unpack("<Q", data[off:off + 8])
        (hc,) = struct.unpack("<I", data[off + 8:off + 12])
        assert hc == _masked_crc(data[off:off + 8])
        payload = data[off + 12:off + 12 + ln]
        (pc,) = struct.unpack("<I", data[off + 12 + ln:off + 16 + ln])
        assert pc == _masked_crc(payload)
        yield payload
        off += 16 + ln


def test_event_file_framing(tmp_path):
    w = SummaryWriter(tmp_path)
    w.add_scalar("loss", 0.5, 1)
    w.add_scalars({"a": 1.0, "bad": "not-a-number"}, 2, prefix="val/")
    w.add_image("panel", np.zeros((4, 6, 3), np.uint8), 3)
    w.close()
    f = next(tmp_path.glob("events.out.tfevents.*"))
    records = list(_walk_records(f))
    # file_version + loss + val/a (bad skipped) + panel
    assert len(records) == 4
    assert b"brain.Event:2" in records[0]
    assert b"loss" in records[1]
    assert b"val/a" in records[2]
    assert b"panel" in records[3] and b"PNG" in records[3]


@pytest.mark.heavy  # tensorboard import takes ~1 min in this image
def test_event_file_loads_in_stock_tensorboard(tmp_path):
    tb = pytest.importorskip("tensorboard")  # noqa: F841
    from tensorboard.backend.event_processing.event_file_loader import (
        EventFileLoader,
    )

    w = SummaryWriter(tmp_path)
    w.add_scalar("train/loss", 0.25, 7)
    w.add_image("panel", np.full((2, 2, 3), 128, np.uint8), 8)
    w.close()
    f = next(tmp_path.glob("events.out.tfevents.*"))
    events = list(EventFileLoader(str(f)).Load())
    assert events[0].file_version == "brain.Event:2"
    scalar = events[1]
    assert scalar.step == 7
    v = scalar.summary.value[0]
    assert v.tag == "train/loss"
    # the loader's data_compat migrates simple_value → tensor(float_val)
    got = v.tensor.float_val[0] if v.tensor.float_val else v.simple_value
    assert abs(got - 0.25) < 1e-6
    assert v.metadata.data_class == 1  # DATA_CLASS_SCALAR
    # data_compat migrates Image → tensor(string_val=[w, h, png]) under the
    # "images" plugin
    iv = events[2].summary.value[0]
    assert iv.metadata.plugin_data.plugin_name == "images"
    sv = iv.tensor.string_val
    assert sv[0] == b"2" and sv[1] == b"2"
    assert sv[2].startswith(b"\x89PNG")


def test_metrics_logger_tb_and_csv(tmp_path):
    logger = MetricsLogger(tmp_path, "stageX")
    logger.log({"epoch": 0, "train_loss": 1.5, "name": "str-skipped"})
    logger.log({"epoch": 1, "train_loss": 0.5})
    logger.log_image("val_panel", np.zeros((4, 4, 3), np.uint8), step=1)
    assert (tmp_path / "stageX_metrics.csv").exists()
    assert (tmp_path / "stageX_events.jsonl").exists()
    f = next((tmp_path / "tb").glob("events.out.tfevents.*"))
    records = list(_walk_records(f))
    assert any(b"stageX/train_loss" in r for r in records)
    assert any(b"stageX/val_panel" in r for r in records)


def test_snapshot_code_and_panel(tmp_path):
    dst = snapshot_code(tmp_path)
    assert (dst / "core" / "logging.py").exists()
    assert not list(dst.rglob("__pycache__"))

    from pistoseg_tpu.core.visualize import validation_panel

    img = np.random.RandomState(0).randint(0, 255, (16, 16, 3), np.uint8)
    gt = np.zeros((16, 16), np.uint8)
    pred = np.ones((16, 16), np.uint8)
    panel = validation_panel((0, 64, 128, 64, 128, 0, 243, 152, 0), img, gt, pred)
    assert panel.ndim == 3 and panel.shape[-1] == 3 and panel.dtype == np.uint8
