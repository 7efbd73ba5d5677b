"""MetricWriter: JSONL records, reference scalar names, TB event files."""

import json
import os

import pytest

from blt_vqg_tpu.core.metrics import MetricWriter


class TestMetricWriter:
    def test_jsonl_records_with_reference_names(self, tmp_path):
        w = MetricWriter(str(tmp_path))
        w.write(10, {"loss": 1.5, "rec": 1.2, "ppl": 3.3}, prefix="train")
        w.write(10, {"loss": 2.0, "kld": 0.5}, prefix="val")
        w.close()
        lines = [json.loads(l) for l in open(w.jsonl_path)]
        assert lines[0]["step"] == 10
        # reference scalar names (train_iq.py:122-128, 149-155)
        assert lines[0]["train loss"] == 1.5
        assert lines[0]["train rec loss"] == 1.2
        assert lines[0]["perplexity"] == 3.3
        assert lines[1]["val_loss"] == 2.0
        assert lines[1]["val_kld_loss"] == 0.5

    def test_unknown_keys_get_prefixed(self, tmp_path):
        w = MetricWriter(str(tmp_path))
        w.write(1, {"grad_norm": 4.2}, prefix="train")
        w.close()
        rec = json.loads(open(w.jsonl_path).readline())
        assert rec["train_grad_norm"] == 4.2

    def test_tensorboard_event_files_written(self, tmp_path):
        w = MetricWriter(str(tmp_path))
        w.write(1, {"loss": 1.0}, prefix="train")
        w.close()
        tb_dir = os.path.join(str(tmp_path), "tb")
        if w._tb is None and not os.path.isdir(tb_dir):
            pytest.skip("tensorboard writer unavailable in this env")
        assert any(f.startswith("events") for f in os.listdir(tb_dir))

    def test_double_close_is_safe(self, tmp_path):
        w = MetricWriter(str(tmp_path))
        w.close()
        w.close()
