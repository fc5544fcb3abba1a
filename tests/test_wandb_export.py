"""W&B-compatible export contract (obs/wandb_export.py): directory tree,
history stream, summary — mirroring /root/reference/cgan/wandb/run-*/files."""

import json

from gcssl_tpu.obs.wandb_export import WandbExporter


def test_export_tree_and_summary(tmp_path):
    ex = WandbExporter(tmp_path, project="p", run_name="r", config={"a": 1})
    ex.log({"epoch": 1, "loss": 0.5})
    ex.log({"epoch": 2, "loss": 0.25, "delta_iou": 0.01})
    run_dir = ex.finish({"final": True})

    files = run_dir / "files"
    assert (files / "wandb-metadata.json").exists()
    assert json.loads((files / "config.json").read_text()) == {"a": 1}
    hist = [json.loads(l) for l in (files / "wandb-history.jsonl").read_text().splitlines()]
    assert [h["_step"] for h in hist] == [0, 1]
    summary = json.loads((files / "wandb-summary.json").read_text())
    assert summary["loss"] == 0.25 and summary["delta_iou"] == 0.01
    assert summary["final"] is True


def test_calibrator_config_knob():
    from gcssl_tpu.core.config import CalibratorConfig

    assert CalibratorConfig().train.wandb is False
