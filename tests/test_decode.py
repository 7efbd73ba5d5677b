"""Beam search and RNN decode tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blt_vqg_tpu.models.iq import IQ


@pytest.fixture(scope="module")
def small_model(request):
    cfg = request.getfixturevalue("tiny_cfg")
    vs = request.getfixturevalue("vocab_size")
    model = IQ(cfg, vs)
    b = 2
    images = jnp.zeros((b, cfg.image_size, cfg.image_size, 3))
    context = jnp.ones((b, cfg.max_context_len), jnp.int32)
    posterior = jnp.ones((b, cfg.max_posterior_len), jnp.int32)
    target = jnp.ones((b, cfg.max_q_length), jnp.int32)
    variables = model.init(
        {"params": jax.random.key(0), "latent": jax.random.key(1),
         "dropout": jax.random.key(2)},
        images, context, posterior, target, latent_mode=True, train=False)
    return cfg, model, variables, images, context


class TestBeamSearch:
    def test_shapes(self, small_model):
        cfg, model, variables, images, context = small_model
        out = model.apply(variables, images, context, beam_size=3,
                          max_decode_length=cfg.max_decode_length,
                          method=IQ.decode_beam)
        b = images.shape[0]
        assert out["tokens"].shape == (b, cfg.max_decode_length + 1)
        assert out["scores"].shape == (b,)
        assert np.all(np.isfinite(np.asarray(out["scores"])))

    def test_beam1_matches_greedy(self, small_model):
        """beam_size=1 must reduce exactly to greedy decoding."""
        cfg, model, variables, images, context = small_model
        greedy = model.apply(variables, images, context,
                             max_decode_length=cfg.max_decode_length,
                             method=IQ.decode_greedy)
        beam = model.apply(variables, images, context, beam_size=1,
                           max_decode_length=cfg.max_decode_length,
                           method=IQ.decode_beam)
        g = np.asarray(greedy["tokens"])
        bm = np.asarray(beam["tokens"])
        # compare up to each row's first <end> (post-<end> emissions differ:
        # greedy keeps argmaxing, beam pads finished beams)
        for i in range(g.shape[0]):
            ends = np.where(g[i] == 3)[0]
            stop = ends[0] + 1 if len(ends) else g.shape[1]
            np.testing.assert_array_equal(g[i, :stop], bm[i, :stop])

    def test_wider_beam_not_worse(self, small_model):
        """A wider beam's (unnormalized-comparable) best score should be >=
        the greedy path's score under the same scoring rule."""
        cfg, model, variables, images, context = small_model
        s1 = model.apply(variables, images, context, beam_size=1,
                         max_decode_length=8, method=IQ.decode_beam)["scores"]
        s4 = model.apply(variables, images, context, beam_size=4,
                         max_decode_length=8, method=IQ.decode_beam)["scores"]
        assert np.all(np.asarray(s4) >= np.asarray(s1) - 1e-4)


class TestTrainerBeamValidate:
    def test_decode_report_uses_beam_when_configured(self, tiny_cfg,
                                                     vocab_size, tmp_path):
        """cfg.beam_size > 1 must switch Trainer's validation decode report
        to beam search (VERDICT round-1 weak #9: the flag used to be honored
        only by cli/evaluate_iq)."""
        from blt_vqg_tpu.text.vocabulary import Vocabulary
        from blt_vqg_tpu.train.trainer import Trainer

        vocab = Vocabulary()
        for i in range(vocab_size - len(vocab)):
            vocab.add_word(f"w{i}")
        cfg = tiny_cfg.replace(beam_size=2, max_decode_length=6,
                               output_dir=str(tmp_path))
        trainer = Trainer(cfg, vocab)
        assert trainer._beam_steps is not None

        b = cfg.batch_size
        batch = {
            "images": np.zeros((b, cfg.image_size, cfg.image_size, 3),
                               np.float32),
            "context": np.ones((b, cfg.max_context_len), np.int32),
            "posterior": np.ones((b, cfg.max_posterior_len), np.int32),
            "target": np.ones((b, cfg.max_q_length), np.int32),
            "answer_types": np.zeros((b,), np.int32),
        }
        state = trainer.init_state(
            {k: batch[k] for k in ("images", "context", "posterior",
                                   "target")}, resume=False)
        scores = trainer.decode_report(state, batch, latent=True, step=0,
                                       print_samples=1)
        assert set(scores) >= {"Bleu_1", "Bleu_4", "ROUGE_L", "CIDEr"}

        # greedy trainer: no beam steps built
        t2 = Trainer(cfg.replace(beam_size=1), vocab)
        assert t2._beam_steps is None


class TestBeamQualityOnTrainedModel:
    @pytest.mark.e2e
    def test_beam_bleu_not_worse_than_greedy(self, tmp_path):
        """On the learnable synthetic task, after a short pretrain, beam
        search's corpus BLEU must not fall below greedy's (the quality
        criterion VERDICT round-1 #7 asked for)."""
        import jax
        from blt_vqg_tpu.core.config import Config
        from blt_vqg_tpu.data.dataset import IQDataset
        from blt_vqg_tpu.data.loader import make_loader
        from blt_vqg_tpu.data.synthetic import write_synthetic_hdf5
        from blt_vqg_tpu.models.iq import IQ as IQModel
        from blt_vqg_tpu.text.vocabulary import Vocabulary
        from blt_vqg_tpu.train.nlg_metrics import corpus_bleu
        from blt_vqg_tpu.train.state import create_train_state
        from blt_vqg_tpu.train.step import (make_beam_decode_step,
                                            make_decode_step, make_train_step)

        vs = 40
        h5 = str(tmp_path / "learn.hdf5")
        write_synthetic_hdf5(h5, num_questions=128, num_images=8,
                             im_size=16, vocab_size=vs, learnable=True)
        vocab = Vocabulary()
        for i in range(vs - len(vocab)):
            vocab.add_word(f"w{i}")
        cfg = Config(emb_dim=16, hidden_dim=32, latent_dim=16, pwffn_dim=64,
                     num_layers=1, num_heads=2, batch_size=32, image_size=16,
                     max_q_length=20, max_decode_length=8, warmup_steps=20,
                     beam_size=3, dtype="float32", compat_pad_seed=False,
                     num_pretraining_steps=60, total_training_steps=60,
                     full_kl_step=10)
        ds = IQDataset(h5, vocab)
        it = make_loader(ds, cfg.batch_size, "cat", seed=0)
        model = IQModel(cfg, vs)
        first = next(it)
        mb0 = {k: first[k] for k in ("images", "context", "posterior",
                                     "target")}
        state = create_train_state(cfg, model, jax.random.key(0), mb0)
        step = make_train_step(cfg, latent_mode=False)
        for i in range(60):
            batch = next(it)
            mb = {k: batch[k] for k in ("images", "context", "posterior",
                                        "target")}
            state, m = step(state, mb, jax.random.key(i))
        assert float(m["rec"]) < 1.0, float(m["rec"])  # actually learned

        greedy = make_decode_step(cfg, model, latent_mode=False)
        beam = make_beam_decode_step(cfg, model, latent_mode=False)
        val = next(make_loader(ds, cfg.batch_size, "cat", shuffle=False,
                               epochs=1))
        images = val["images"]
        ctx = np.asarray(val["answer_types"])[:, None].astype(np.int32)

        def bleu(tokens):
            hyps, refs = [], []
            for row, ref in zip(np.asarray(tokens),
                                np.asarray(val["target"])):
                hyps.append([f"t{t}" for t in row if t not in (0, 1, 3)])
                refs.append([[f"t{t}" for t in ref if t not in (0, 1, 3)]])
            return corpus_bleu(refs, hyps, 1)[0]

        g = bleu(greedy(state, images, jnp.asarray(ctx),
                        jax.random.key(1))["tokens"])
        b = bleu(beam(state, images, jnp.asarray(ctx),
                      jax.random.key(1))["tokens"])
        assert b >= g - 0.02, (b, g)


class TestServingDecode:
    def test_probe_free_matches_probed_tokens(self, small_model):
        """with_probe=False (serving path: no per-step top-6 top_k) must
        emit exactly the same tokens as the probed decode."""
        cfg, model, variables, images, context = small_model
        probed = model.apply(variables, images, context,
                             max_decode_length=cfg.max_decode_length,
                             method=IQ.decode_greedy)
        serving = model.apply(variables, images, context,
                              max_decode_length=cfg.max_decode_length,
                              with_probe=False, method=IQ.decode_greedy)
        np.testing.assert_array_equal(np.asarray(probed["tokens"]),
                                      np.asarray(serving["tokens"]))
        assert set(serving) == {"tokens"}

    def test_probe_free_early_stop(self, small_model):
        cfg, model, variables, images, context = small_model
        out = model.apply(variables, images, context,
                          max_decode_length=cfg.max_decode_length,
                          with_probe=False, early_stop=True,
                          method=IQ.decode_greedy)
        assert set(out) == {"tokens"}
        assert out["tokens"].shape == (images.shape[0],
                                       cfg.max_decode_length + 1)


class TestEarlyStopDecode:
    def test_matches_scan_up_to_end(self, small_model):
        cfg, model, variables, images, context = small_model
        scan = model.apply(variables, images, context,
                           max_decode_length=cfg.max_decode_length,
                           method=IQ.decode_greedy)
        early = model.apply(variables, images, context,
                            max_decode_length=cfg.max_decode_length,
                            early_stop=True, method=IQ.decode_greedy)
        s = np.asarray(scan["tokens"])
        e = np.asarray(early["tokens"])
        for i in range(s.shape[0]):
            ends = np.where(s[i] == 3)[0]
            stop = ends[0] + 1 if len(ends) else s.shape[1]
            np.testing.assert_array_equal(s[i, :stop], e[i, :stop])
            # post-<end> positions are <pad> in the early-stop variant
            if len(ends):
                assert np.all(e[i, stop:] == 0)


class TestRNN:
    def test_encoder_last_valid_state(self):
        from blt_vqg_tpu.ops.rnn import RNNEncoder
        enc = RNNEncoder(vocab_size=20, emb_dim=8, hidden_size=12,
                         rnn_cell="lstm")
        toks = jnp.array([[5, 6, 7, 0, 0], [5, 0, 0, 0, 0]])
        params = enc.init(jax.random.key(0), toks)
        ys, final = enc.apply(params, toks)
        assert ys.shape == (2, 5, 12)
        np.testing.assert_allclose(np.asarray(final[0]),
                                   np.asarray(ys[0, 2]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(final[1]),
                                   np.asarray(ys[1, 0]), atol=1e-6)

    @pytest.mark.parametrize("cell", ["lstm", "gru"])
    def test_decoder_teacher_forced_and_greedy(self, cell):
        from blt_vqg_tpu.ops.rnn import RNNDecoder
        dec = RNNDecoder(vocab_size=20, emb_dim=8, hidden_size=12,
                         rnn_cell=cell)
        toks = jnp.array([[1, 5, 6], [1, 7, 8]])
        ctx = jnp.ones((2, 12))
        params = dec.init(jax.random.key(0), toks, ctx,
                          method=RNNDecoder.teacher_forced)
        logits = dec.apply(params, toks, ctx,
                           method=RNNDecoder.teacher_forced)
        assert logits.shape == (2, 3, 20)
        out = dec.apply(params, 2, 6, 1, ctx, method=RNNDecoder.greedy)
        assert out.shape == (2, 6)
        assert out.dtype == jnp.int32


class TestCompatDecodePadMask:
    def test_decode_greedy_matches_full_prefix_reference_semantics(
            self, tiny_cfg, vocab_size):
        """cfg.compat_decode_pad_mask: the production KV-cache scan decode
        must emit the same tokens as a slow full-prefix re-decode that
        follows the reference's inference loop exactly — re-embed the grown
        prefix, pad-TOKEN mask it (the pad seed is a masked key, reference
        decoder_transformer.py:44), full decoder pass, argmax of the last
        row (reference iq.py:134-143)."""
        from blt_vqg_tpu.ops.masks import pad_mask

        cfg = tiny_cfg.replace(compat_pad_seed=True,
                               compat_decode_pad_mask=True,
                               attention_dropout=0.0, relu_dropout=0.0)
        model = IQ(cfg, vocab_size)
        b = 3
        r = np.random.RandomState(5)
        images = jnp.asarray(r.rand(b, cfg.image_size, cfg.image_size, 3),
                             jnp.float32)
        context = jnp.asarray(
            np.concatenate([r.randint(6, vocab_size, (b, 3)),
                            np.zeros((b, cfg.max_context_len - 3))], 1),
            jnp.int32)
        posterior = jnp.ones((b, cfg.max_posterior_len), jnp.int32)
        target = jnp.ones((b, cfg.max_q_length), jnp.int32)
        variables = model.init(
            {"params": jax.random.key(0), "latent": jax.random.key(1),
             "dropout": jax.random.key(2)},
            images, context, posterior, target, latent_mode=False,
            train=False)
        # keep argmax off <pad>: an emitted pad is a never-attended key
        # whose state legitimately drifts between the two formulations
        variables = jax.tree_util.tree_map(lambda x: x, variables)
        op = dict(variables["params"]["output_proj"])
        op["bias"] = op["bias"].at[0].add(-100.0)
        variables["params"] = dict(variables["params"], output_proj=op)

        fast = model.apply(variables, images, context,
                           max_decode_length=cfg.max_decode_length,
                           latent_mode=False, method=IQ.decode_greedy)
        fast_tokens = np.asarray(fast["tokens"])

        # ---- slow oracle: the reference loop, on OUR modules ----
        bound = model.bind(variables)
        img_feat = bound.encoder_cnn(images, train=False)
        enc, src_mask = bound.encode_context(context, img_feat, True)
        inject = img_feat.astype(enc.dtype)
        steps = cfg.max_decode_length + 1
        ys = np.zeros((b, 1), np.int32)  # <pad> seed
        slow_tokens = []
        for _ in range(steps):
            emb = bound.embed_tokens(jnp.asarray(ys))
            emb = emb.at[:, 0].add(inject)
            trg_mask = pad_mask(jnp.asarray(ys))
            out = bound.decoder(emb, enc, src_mask, trg_mask, True)
            logits = bound.output_proj(out[:, -1].astype(jnp.float32))
            nxt = np.asarray(jnp.argmax(logits, axis=-1)).astype(np.int32)
            slow_tokens.append(nxt.copy())
            ys = np.concatenate([ys, nxt[:, None]], axis=1)

        np.testing.assert_array_equal(fast_tokens,
                                      np.stack(slow_tokens, axis=1))

    @pytest.mark.parametrize("path_kw", [
        dict(use_pallas_decode=True),
        dict(use_stream_decode=True),
    ], ids=["pallas_layer", "stream"])
    def test_pallas_paths_match_xla_compat_decode(self, tiny_cfg,
                                                  vocab_size, path_kw):
        """compat_decode_pad_mask on the Pallas decode paths: the fused
        per-layer kernel and the whole-stack stream kernel must emit the
        same tokens as the XLA compat decode (itself oracle-verified
        against the reference loop above).  In-kernel pad-key masking uses
        the same fill-constant ordering as ops/attention.py:188-196."""
        base = tiny_cfg.replace(compat_pad_seed=True,
                                compat_decode_pad_mask=True,
                                attention_dropout=0.0, relu_dropout=0.0)
        model = IQ(base, vocab_size)
        b = 3
        r = np.random.RandomState(7)
        images = jnp.asarray(r.rand(b, base.image_size, base.image_size, 3),
                             jnp.float32)
        context = jnp.asarray(
            np.concatenate([r.randint(6, vocab_size, (b, 3)),
                            np.zeros((b, base.max_context_len - 3))], 1),
            jnp.int32)
        posterior = jnp.ones((b, base.max_posterior_len), jnp.int32)
        target = jnp.ones((b, base.max_q_length), jnp.int32)
        variables = model.init(
            {"params": jax.random.key(0), "latent": jax.random.key(1),
             "dropout": jax.random.key(2)},
            images, context, posterior, target, latent_mode=False,
            train=False)
        # keep argmax off <pad> (see the oracle test above); a pad seed at
        # pos 0 still exercises the pad-key masking every step
        op = dict(variables["params"]["output_proj"])
        op["bias"] = op["bias"].at[0].add(-100.0)
        variables["params"] = dict(variables["params"], output_proj=op)

        def decode(cfg):
            m = IQ(cfg, vocab_size)
            out = m.apply(variables, images, context,
                          max_decode_length=cfg.max_decode_length,
                          latent_mode=False, method=IQ.decode_greedy)
            return np.asarray(out["tokens"])

        ref_tokens = decode(base)
        pallas_tokens = decode(base.replace(**path_kw))
        np.testing.assert_array_equal(pallas_tokens, ref_tokens)
