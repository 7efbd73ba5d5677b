"""Extension-component tests: ViT encoder, BPE tokenizer, weighted sampler,
NaN guard, distributed helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestViT:
    def test_backbone_shapes(self):
        from blt_vqg_tpu.ops.vit import ViTEncoder
        enc = ViTEncoder(hidden_dim=32, dtype=jnp.float32, patch=8, depth=2,
                         dim=16, heads=2, mlp_dim=32)
        imgs = jnp.zeros((2, 32, 32, 3))
        vars_ = enc.init(jax.random.key(0), imgs, train=False)
        out = enc.apply(vars_, imgs, train=False)
        assert out.shape == (2, 32)
        # frozen-backbone mask must see a 'backbone' scope
        assert "backbone" in vars_["params"]

    def test_iq_with_vit_encoder(self, tiny_cfg, vocab_size):
        from blt_vqg_tpu.models.iq import IQ
        cfg = tiny_cfg.replace(image_encoder="vit_b16")
        # shrink the vit by monkeypatching is overkill; 32px/16patch → 4+1
        model = IQ(cfg, vocab_size)
        b = 1
        images = jnp.zeros((b, cfg.image_size, cfg.image_size, 3))
        context = jnp.ones((b, cfg.max_context_len), jnp.int32)
        posterior = jnp.ones((b, cfg.max_posterior_len), jnp.int32)
        target = jnp.ones((b, cfg.max_q_length), jnp.int32)
        variables = model.init(
            {"params": jax.random.key(0), "latent": jax.random.key(1),
             "dropout": jax.random.key(2)},
            images, context, posterior, target, latent_mode=True)
        logits, _, _, _ = model.apply(
            variables, images, context, posterior, target, latent_mode=False)
        assert logits.shape == (b, cfg.max_q_length, vocab_size)


class TestBPE:
    @pytest.fixture(scope="class")
    def trained(self):
        from blt_vqg_tpu.text.bpe import BPETokenizer
        corpus = ["what color is the cat", "what color is the dog",
                  "how many cats are there", "what is the color",
                  "is the cat black", "is the dog white"] * 10
        tok = BPETokenizer()
        tok.train(corpus, vocab_size=300)
        return tok

    def test_roundtrip(self, trained):
        for s in ("what color is the cat", "is the dog white",
                  "unseen wordhere"):
            ids = trained.encode(s)
            assert ids[0] == trained.token2id["<start>"]
            assert ids[-1] == trained.token2id["<end>"]
            assert trained.decode(ids) == s

    def test_merges_learned(self, trained):
        assert len(trained.merges) > 0
        # frequent words should compress well below byte length
        ids = trained.encode("what color", add_special=False)
        assert len(ids) < len("what color".encode())

    def test_save_load(self, trained, tmp_path):
        from blt_vqg_tpu.text.bpe import BPETokenizer
        p = str(tmp_path / "bpe.json")
        trained.save(p)
        re = BPETokenizer.load(p)
        s = "what color is the cat"
        assert re.encode(s) == trained.encode(s)
        assert len(re) == len(trained)

    def test_reserved_ids_match_vocabulary_contract(self, trained):
        assert trained.token2id["<pad>"] == 0
        assert trained.token2id["<start>"] == 1
        assert trained.token2id["<end>"] == 3


class TestWeightedSampler:
    def test_rebalances(self, tmp_path):
        from blt_vqg_tpu.data.synthetic import write_synthetic_hdf5
        from blt_vqg_tpu.data.dataset import IQDataset
        from blt_vqg_tpu.data.loader import make_loader
        from blt_vqg_tpu.text.vocabulary import Vocabulary
        h5 = str(tmp_path / "d.hdf5")
        write_synthetic_hdf5(h5, num_questions=64, num_images=4, im_size=8,
                             vocab_size=40, num_categories=2)
        v = Vocabulary()
        for i in range(40 - len(v)):
            v.add_word(f"w{i}")
        ds = IQDataset(h5, v)
        # upweight rows of category word-id 6 (raw cat 0) 100:1
        import h5py
        with h5py.File(h5, "r") as f:
            raw = f["answer_types"][:]
        weights = np.where(raw == 0, 100.0, 1.0)
        counts = {6: 0, 7: 0}
        for b in make_loader(ds, 16, "ans", epochs=4, device=False,
                             sample_weights=weights):
            for t in np.asarray(b["answer_types"]):
                counts[int(t)] += 1
        assert counts[6] > 5 * counts[7]


class TestNaNGuard:
    def test_guarded_update_skips_nonfinite(self):
        from blt_vqg_tpu.core.debug import guarded_update
        old = {"w": jnp.zeros(3)}
        new = {"w": jnp.ones(3)}
        picked, m = guarded_update(old, new, {"loss": jnp.asarray(jnp.nan)})
        np.testing.assert_array_equal(np.asarray(picked["w"]), 0.0)
        assert float(m["skipped_nonfinite"]) == 1.0
        picked, m = guarded_update(old, new, {"loss": jnp.asarray(1.0)})
        np.testing.assert_array_equal(np.asarray(picked["w"]), 1.0)
        assert float(m["skipped_nonfinite"]) == 0.0

    def test_train_step_guard_integration(self, tiny_cfg, vocab_size):
        from blt_vqg_tpu.models.iq import IQ
        from blt_vqg_tpu.train.state import create_train_state
        from blt_vqg_tpu.train.step import make_train_step
        cfg = tiny_cfg.replace(guard_nonfinite=True)
        model = IQ(cfg, vocab_size)
        batch = {
            "images": jnp.zeros((2, cfg.image_size, cfg.image_size, 3)),
            "context": jnp.ones((2, cfg.max_context_len), jnp.int32),
            "posterior": jnp.ones((2, cfg.max_posterior_len), jnp.int32),
            "target": jnp.ones((2, cfg.max_q_length), jnp.int32),
        }
        state = create_train_state(cfg, model, jax.random.key(0), batch)
        step = make_train_step(cfg, latent_mode=False)
        state2, metrics = step(state, batch, jax.random.key(1))
        assert float(metrics["skipped_nonfinite"]) == 0.0
        assert int(state2.step) == 1


class TestDistributedHelpers:
    def test_initialize_noop_single_process(self):
        from blt_vqg_tpu.core.distributed import initialize_distributed
        initialize_distributed()  # must not raise

    def test_host_local_batch_to_global(self, eight_devices):
        from blt_vqg_tpu.core.distributed import host_local_batch_to_global
        from blt_vqg_tpu.parallel.mesh import build_mesh
        mesh = build_mesh((8, 1))
        batch = {"x": np.arange(32, dtype=np.float32).reshape(16, 2)}
        out = host_local_batch_to_global(batch, mesh)
        assert out["x"].shape == (16, 2)
        np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])

    def test_loader_multihost_path(self, eight_devices, tmp_path):
        """make_loader(multihost=True) routes batches through
        jax.make_array_from_process_local_data on the 8-device mesh and
        yields the same global values/shardings as the device_put path
        (single process: the local shard IS the global batch)."""
        from blt_vqg_tpu.data.dataset import IQDataset
        from blt_vqg_tpu.data.loader import make_loader
        from blt_vqg_tpu.data.synthetic import write_synthetic_hdf5
        from blt_vqg_tpu.parallel.mesh import build_mesh
        from blt_vqg_tpu.text.vocabulary import Vocabulary

        path = str(tmp_path / "synth.hdf5")
        write_synthetic_hdf5(path, num_questions=32, num_images=4,
                             im_size=16, vocab_size=40)
        vocab = Vocabulary()
        for i in range(40 - len(vocab)):
            vocab.add_word(f"w{i}")
        ds = IQDataset(path, vocab)
        mesh = build_mesh((8, 1))
        a = next(make_loader(ds, 16, "ans", shuffle=False, mesh=mesh,
                             multihost=True))
        b = next(make_loader(ds, 16, "ans", shuffle=False, mesh=mesh,
                             multihost=False))
        for k in a:
            assert a[k].shape == b[k].shape, k
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
            assert a[k].sharding.is_equivalent_to(b[k].sharding,
                                                  a[k].ndim), k
