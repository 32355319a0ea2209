"""TensorBoard observability parity: MetricsWriter event files are readable
by standard TB tooling (reference writes TB scalars at
run/main_run.py:50-53,213-220; round 1 wrote JSONL only)."""

import glob
import json
import os

import pytest

tensorboard = pytest.importorskip("tensorboard")

from clipspm_tpu.utils.metrics import MetricsWriter, jsonl_to_tensorboard


def _read_scalars(tb_dir):
    # LegacyEventFileLoader returns events verbatim; the default
    # EventFileLoader migrates simple_value scalars into tensor protos
    from tensorboard.backend.event_processing.event_file_loader import \
        LegacyEventFileLoader

    out = []
    for path in sorted(glob.glob(os.path.join(tb_dir, "events.out.*"))):
        for event in LegacyEventFileLoader(path).Load():
            for v in event.summary.value:
                out.append((event.step, v.tag, v.simple_value))
    return out


def test_metrics_writer_emits_tb_events(tmp_path):
    jsonl = tmp_path / "metrics.jsonl"
    tb_dir = tmp_path / "tb"
    w = MetricsWriter(str(jsonl), tb_dir=str(tb_dir))
    w.scalars({"loss/Train_loss[it]": 1.5, "acc/Train_acc[it]": 0.25}, 4)
    w.scalar("acc/Test_acc", 62.5, 8)
    w.close()

    got = _read_scalars(str(tb_dir))
    assert (4, "loss/Train_loss[it]", 1.5) in got
    assert (4, "acc/Train_acc[it]", 0.25) in got
    assert (8, "acc/Test_acc", 62.5) in got
    # the JSONL twin carries the same scalars
    recs = [json.loads(l) for l in jsonl.read_text().splitlines()]
    assert {r["tag"] for r in recs} == {"loss/Train_loss[it]",
                                        "acc/Train_acc[it]", "acc/Test_acc"}


def test_jsonl_to_tb_converter(tmp_path):
    jsonl = tmp_path / "metrics.jsonl"
    w = MetricsWriter(str(jsonl))
    w.scalar("loss/Test_loss", 0.75, 100)
    w.close()
    out = tmp_path / "converted"
    n = jsonl_to_tensorboard(str(jsonl), str(out))
    assert n == 1
    assert (100, "loss/Test_loss", 0.75) in _read_scalars(str(out))
