"""Real-VQA replication entry point (cli/replicate_vqa.py — VERDICT r3 #9):
path pre-flight with fixtures, command plumbing, and the --resnet_ckpt
backbone graft."""

import json
import os

import numpy as np
import pytest

from blt_vqg_tpu.cli.replicate_vqa import (build_commands, build_parser,
                                           preflight)


def _fake_vqa_root(tmp_path, *, break_nothing=True):
    root = tmp_path / "vqa"
    for split in ("train2014", "val2014"):
        d = root / split
        d.mkdir(parents=True)
        # tiny but REAL jpeg so the image check sees a plausible dir
        from PIL import Image
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            str(d / f"COCO_{split}_000000000001.jpg"))
        with open(root / f"v2_OpenEnded_mscoco_{split}_questions.json",
                  "w") as f:
            json.dump({"questions": [{"image_id": 1, "question_id": 0,
                                      "question": "what is this?"}]}, f)
        with open(root / f"v2_mscoco_{split}_annotations.json", "w") as f:
            json.dump({"annotations": [{"image_id": 1, "question_id": 0,
                                        "multiple_choice_answer": "cat"}]},
                      f)
    with open(root / "iq_dataset.json", "w") as f:
        json.dump({"animal": ["cat", "dog"]}, f)
    return str(root)


def _args(root, extra=()):
    return build_parser().parse_args(["--data-root", root, *extra])


class TestPreflight:
    def test_complete_root_passes(self, tmp_path):
        root = _fake_vqa_root(tmp_path)
        assert preflight(_args(root)) == []

    def test_missing_pieces_reported(self, tmp_path):
        root = _fake_vqa_root(tmp_path)
        os.remove(os.path.join(
            root, "v2_mscoco_val2014_annotations.json"))
        os.remove(os.path.join(root, "iq_dataset.json"))
        problems = preflight(_args(root))
        assert any("val2014 annotations" in p for p in problems)
        assert any("cat2ans" in p for p in problems)

    def test_malformed_json_reported(self, tmp_path):
        root = _fake_vqa_root(tmp_path)
        with open(os.path.join(
                root, "v2_OpenEnded_mscoco_train2014_questions.json"),
                "w") as f:
            json.dump({"wrong": []}, f)
        problems = preflight(_args(root))
        assert any("'questions' key" in p for p in problems)

    def test_glove_validation(self, tmp_path):
        root = _fake_vqa_root(tmp_path)
        bad = tmp_path / "glove.txt"
        bad.write_text("word 0.1 0.2\n")  # 2 dims, not 300
        problems = preflight(_args(root, ["--glove", str(bad)]))
        assert any("300 floats" in p for p in problems)
        good = tmp_path / "glove300.txt"
        good.write_text("word " + " ".join(["0.1"] * 300) + "\n")
        assert preflight(_args(root, ["--glove", str(good)])) == []

    def test_resnet_ckpt_validation(self, tmp_path):
        from tests.test_resnet_import import synthetic_state_dict
        root = _fake_vqa_root(tmp_path)
        sd = {k: v.numpy() for k, v in synthetic_state_dict().items()}
        ck = tmp_path / "resnet18.npz"
        np.savez(str(ck), **sd)
        assert preflight(_args(root, ["--resnet-ckpt", str(ck)])) == []
        bad = tmp_path / "broken.npz"
        np.savez(str(bad), **{"conv1.weight": sd["conv1.weight"]})
        problems = preflight(_args(root, ["--resnet-ckpt", str(bad)]))
        assert any("resnet ckpt" in p for p in problems)


class TestCommandPlumbing:
    def test_default_pipeline(self, tmp_path):
        root = _fake_vqa_root(tmp_path)
        cmds = build_commands(_args(root))
        mods = [c[1] for c in cmds]
        assert mods == ["blt_vqg_tpu.cli.store_dataset",
                        "blt_vqg_tpu.cli.store_dataset",
                        "blt_vqg_tpu.cli.train_iq",
                        "blt_vqg_tpu.cli.evaluate_iq"]
        etl_val = cmds[1]
        assert "--val" in etl_val
        train = cmds[2]
        assert train[train.index("--total_training_steps") + 1] == "35000"
        # the ETL's vocab/h5 outputs feed training verbatim
        vocab = cmds[0][cmds[0].index("--vocab-path") + 1]
        assert train[train.index("--vocab") + 1] == vocab
        h5 = cmds[0][cmds[0].index("--output") + 1]
        assert train[train.index("--dataset") + 1] == h5

    def test_big_config_matches_run_sh(self, tmp_path):
        root = _fake_vqa_root(tmp_path)
        cmds = build_commands(_args(root, ["--big"]))
        train = cmds[-2]
        for flag, val in (("--hidden_dim", "1024"), ("--latent_dim", "1024"),
                          ("--pwffn_dim", "2048"), ("--num_layers", "6"),
                          ("--num_heads", "8"), ("--batch_size", "64"),
                          ("--num_pretraining_steps", "6000"),
                          ("--input_mode", "cat")):
            assert train[train.index(flag) + 1] == val
        assert "--from-category" in cmds[-1]

    def test_pack_and_optional_inputs(self, tmp_path):
        root = _fake_vqa_root(tmp_path)
        cmds = build_commands(_args(root, [
            "--pack", "--glove", "/g.txt", "--resnet-ckpt", "/r.pth"]))
        mods = [c[1] for c in cmds]
        assert mods.count("blt_vqg_tpu.cli.pack_dataset") == 2
        train = [c for c in cmds if c[1].endswith("train_iq")][0]
        assert train[train.index("--emb_file") + 1] == "/g.txt"
        assert train[train.index("--resnet_ckpt") + 1] == "/r.pth"
        # trains from the PACKED dirs, not the hdf5
        assert train[train.index("--dataset") + 1].endswith("packed_train")

    def test_config_plumbing_parses(self, tmp_path):
        """Every train_iq flag the plan emits is accepted by the real
        config parser (catches arg drift)."""
        from blt_vqg_tpu.core.config import (add_config_args,
                                             config_from_args)
        import argparse
        root = _fake_vqa_root(tmp_path)
        train = build_commands(_args(root, ["--big"]))[-2]
        parser = argparse.ArgumentParser()
        add_config_args(parser)
        parser.add_argument("--resume", action="store_true")
        ns = parser.parse_args(train[2:])
        cfg = config_from_args(ns)
        assert cfg.hidden_dim == 1024 and cfg.input_mode == "cat"
        assert cfg.total_training_steps == 35000


class TestResnetGraft:
    def test_trainer_grafts_pretrained_backbone(self, tmp_path, tiny_cfg):
        from tests.test_resnet_import import synthetic_state_dict
        from blt_vqg_tpu.text.vocabulary import Vocabulary
        from blt_vqg_tpu.train.trainer import Trainer
        sd = {k: v.numpy() for k, v in synthetic_state_dict(5).items()}
        ck = tmp_path / "resnet18.npz"
        np.savez(str(ck), **sd)
        cfg = tiny_cfg.replace(resnet_ckpt=str(ck),
                               output_dir=str(tmp_path / "run"))
        vocab = Vocabulary()
        for i in range(44):
            vocab.add_word(f"w{i}")
        trainer = Trainer(cfg, vocab)
        r = np.random.RandomState(0)
        b = cfg.batch_size
        batch = {
            "images": r.rand(b, cfg.image_size, cfg.image_size, 3
                             ).astype(np.float32),
            "context": r.randint(1, 40, (b, cfg.max_context_len)
                                 ).astype(np.int32),
            "posterior": r.randint(1, 40, (b, cfg.max_posterior_len)
                                   ).astype(np.int32),
            "target": r.randint(1, 40, (b, cfg.max_q_length)
                                ).astype(np.int32),
        }
        state = trainer.init_state(batch, resume=False)
        got = np.asarray(
            state.params["encoder_cnn"]["backbone"]["stem_conv"]["kernel"],
            np.float32)
        want = sd["conv1.weight"].transpose(2, 3, 1, 0)
        np.testing.assert_allclose(got, want, rtol=1e-6)
        bn = np.asarray(
            state.batch_stats["encoder_cnn"]["backbone"]["stem_bn"]["mean"])
        np.testing.assert_allclose(bn, sd["bn1.running_mean"], rtol=1e-6)
