"""z-instrumentation + information-maximization eval (VERDICT r3 #2/#3):
decode z_source variants, IQ.latent_diagnostics, and the diversity metrics
(train/infomax.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blt_vqg_tpu.models.iq import IQ
from blt_vqg_tpu.train.infomax import (category_word_consistency,
                                       diversity_metrics, multi_z_decode)


def _batch(cfg, vocab_size, b=None):
    r = np.random.RandomState(0)
    b = b or cfg.batch_size
    return {
        "images": r.rand(b, cfg.image_size, cfg.image_size, 3
                         ).astype(np.float32),
        "context": r.randint(1, vocab_size,
                             (b, cfg.max_context_len)).astype(np.int32),
        "posterior": r.randint(1, vocab_size,
                               (b, cfg.max_posterior_len)).astype(np.int32),
        "target": r.randint(1, vocab_size,
                            (b, cfg.max_q_length)).astype(np.int32),
    }


@pytest.fixture(scope="module")
def model_state(tiny_cfg, vocab_size):
    from blt_vqg_tpu.train.state import create_train_state
    model = IQ(tiny_cfg, vocab_size)
    batch = _batch(tiny_cfg, vocab_size)
    state = create_train_state(tiny_cfg, model, jax.random.key(0), batch)
    return model, state, batch


class TestZSource:
    def test_prior_mean_is_deterministic(self, model_state, tiny_cfg):
        model, state, batch = model_state
        outs = []
        for key in (jax.random.key(1), jax.random.key(2)):
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch["images"], batch["context"], max_decode_length=6,
                latent_mode=True, z_source="prior_mean", with_probe=False,
                method=IQ.decode_greedy, rngs={"latent": key})
            outs.append(np.asarray(out["tokens"]))
        np.testing.assert_array_equal(outs[0], outs[1])

    def test_prior_sample_varies_with_key(self, model_state):
        model, state, batch = model_state
        outs = []
        for key in (jax.random.key(1), jax.random.key(2)):
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch["images"], batch["context"], max_decode_length=6,
                latent_mode=True, z_source="prior_sample", with_probe=False,
                method=IQ.decode_greedy, rngs={"latent": key})
            outs.append(np.asarray(out["tokens"]))
        # untrained net, wide prior: different keys should differ somewhere
        assert not np.array_equal(outs[0], outs[1])

    def test_posterior_sources(self, model_state):
        """posterior_{mean,sample} condition z on the question tokens; mean
        is deterministic and needs the posterior argument."""
        model, state, batch = model_state
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["images"], batch["context"], max_decode_length=6,
            latent_mode=True, z_source="posterior_mean",
            posterior=batch["posterior"], with_probe=False,
            method=IQ.decode_greedy, rngs={"latent": jax.random.key(1)})
        out2 = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["images"], batch["context"], max_decode_length=6,
            latent_mode=True, z_source="posterior_mean",
            posterior=batch["posterior"], with_probe=False,
            method=IQ.decode_greedy, rngs={"latent": jax.random.key(9)})
        np.testing.assert_array_equal(np.asarray(out["tokens"]),
                                      np.asarray(out2["tokens"]))
        with pytest.raises(ValueError, match="posterior"):
            model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch["images"], batch["context"], max_decode_length=6,
                latent_mode=True, z_source="posterior_mean",
                with_probe=False, method=IQ.decode_greedy,
                rngs={"latent": jax.random.key(1)})

    def test_default_matches_reference_path(self, model_state):
        """z_source='prior_sample' with the same key reproduces the original
        decode exactly (the knob is a no-op at its default)."""
        model, state, batch = model_state
        kw = dict(max_decode_length=6, latent_mode=True, with_probe=False,
                  method=IQ.decode_greedy)
        base = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["images"], batch["context"],
            rngs={"latent": jax.random.key(7)}, **kw)
        explicit = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["images"], batch["context"], z_source="prior_sample",
            rngs={"latent": jax.random.key(7)}, **kw)
        np.testing.assert_array_equal(np.asarray(base["tokens"]),
                                      np.asarray(explicit["tokens"]))

    def test_decode_step_wires_cfg_z_source(self, tiny_cfg, vocab_size,
                                            model_state):
        from blt_vqg_tpu.train.step import make_decode_step
        model, state, batch = model_state
        cfg = tiny_cfg.replace(decode_z_source="prior_mean")
        step = make_decode_step(cfg, model, latent_mode=True)
        a = step(state, batch["images"],
                 batch["context"], jax.random.key(1))
        b = step(state, batch["images"],
                 batch["context"], jax.random.key(2))
        np.testing.assert_array_equal(np.asarray(a["tokens"]),
                                      np.asarray(b["tokens"]))


class TestLatentDiagnostics:
    def test_stats_shapes_and_sanity(self, model_state, tiny_cfg):
        from blt_vqg_tpu.train.step import make_latent_diag_step
        model, state, batch = model_state
        step = make_latent_diag_step(tiny_cfg, model)
        stats = step(state, batch["images"], batch["context"],
                     batch["posterior"])
        assert stats["kl_per_dim"].shape == (tiny_cfg.latent_dim,)
        # per-dim KL(q||p) is nonnegative up to float error
        assert float(jnp.min(stats["kl_per_dim"])) > -1e-5
        assert 0 <= int(stats["active_dims"]) <= tiny_cfg.latent_dim
        for k in ("prior_logvar", "post_logvar", "prior_mean_var",
                  "mean_gap"):
            assert np.isfinite(float(stats[k])), k
        # consistency: mean per-dim KL sums to ~the model's own kld
        kld_model = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["images"], batch["context"], batch["posterior"],
            batch["target"], latent_mode=True, train=False,
            rngs={"latent": jax.random.key(0)})[2]
        np.testing.assert_allclose(float(jnp.sum(stats["kl_per_dim"])),
                                   float(kld_model), rtol=1e-4)

    def test_diag_decode_steps(self, model_state, tiny_cfg):
        from blt_vqg_tpu.train.step import make_diag_decode_step
        model, state, batch = model_state
        for src in ("prior_sample", "prior_mean", "posterior_mean",
                    "posterior_sample"):
            step = make_diag_decode_step(tiny_cfg, model, src)
            out = step(state, batch["images"], batch["context"],
                       batch["posterior"], jax.random.key(3))
            assert out["tokens"].shape == (tiny_cfg.batch_size,
                                           tiny_cfg.max_decode_length + 1)

    def test_eval_step_reports_aux_acc(self, model_state, tiny_cfg):
        from blt_vqg_tpu.train.step import make_eval_step
        model, state, batch = model_state
        metrics = make_eval_step(tiny_cfg, latent_mode=True)(
            state, batch, jax.random.key(0))
        assert "aux_acc" in metrics and 0.0 <= float(
            metrics["aux_acc"]) <= 1.0
        pre = make_eval_step(tiny_cfg, latent_mode=False)(
            state, batch, jax.random.key(0))
        assert "aux_acc" not in pre


class TestDiversityMetrics:
    def test_identical_samples(self):
        # 4 draws, 2 images, all identical (≥4 tokens so BLEU-4 is defined)
        s = [["a b c d e", "d e f g h"]] * 4
        m = diversity_metrics(s)
        assert m["distinct_rate"] == pytest.approx(0.25)
        assert m["self_bleu"] == pytest.approx(1.0)

    def test_fully_distinct_samples(self):
        s = [["a b c d", "x y z w"], ["e f g h", "p q r s"],
             ["i j k l", "t u v a"]]
        m = diversity_metrics(s)
        assert m["distinct_rate"] == pytest.approx(1.0)
        assert m["self_bleu"] < 0.2
        assert m["distinct_1"] > 0.9

    def test_consistency_predicate(self):
        class V:
            idx2word = {6: "red", 7: "blue"}
        fn = category_word_consistency(V())
        s = [["is it red ?", "blue thing ?"],
             ["red again ?", "nothing here ?"]]
        m = diversity_metrics(s, contexts=[0, 1], consistent_fn=fn)
        # draws for image 0 (cat 0 → "red"): both contain it; image 1
        # (cat 1 → "blue"): 1 of 2
        assert m["consistency"] == pytest.approx(3 / 4)

    def test_multi_z_decode_shapes(self, model_state, tiny_cfg):
        from blt_vqg_tpu.train.step import make_decode_step
        model, state, batch = model_state
        step = make_decode_step(tiny_cfg, model, latent_mode=True)
        draws = multi_z_decode(step, state, batch["images"],
                               batch["context"], jax.random.key(0), 3)
        assert len(draws) == 3
        assert draws[0].shape[0] == tiny_cfg.batch_size
        # independent keys: at least one pair differs (untrained prior)
        assert any(not np.array_equal(draws[0], d) for d in draws[1:])


class TestTemplateValidity:
    VMAP = {"0": ["zim ka ro mi?", "zur ka ro mi?"],
            "7": ["zim ta lu ne?", "zur ta lu ne?"]}

    def test_exact_paraphrase_of_the_refs_combo(self):
        from blt_vqg_tpu.train.infomax import template_validity
        fn = template_validity(self.VMAP)
        # detokenized form ("... ?" with a space) matches the generator form
        assert fn("zur ka ro mi ?", "zim ka ro mi?")
        assert fn("zim ka ro mi?", "zur ka ro mi ?")
        # valid string but wrong combo
        assert not fn("zim ta lu ne ?", "zim ka ro mi?")
        # invalid strings / unknown ref
        assert not fn("zim ka ro ta ?", "zim ka ro mi?")
        assert not fn("zim ka ro mi ?", "nope nope?")

    def test_valid_rate_and_distinct_valid(self):
        from blt_vqg_tpu.train.infomax import template_validity
        fn = template_validity(self.VMAP)
        refs = ["zim ka ro mi?", "zur ta lu ne?"]
        # image 0: draws = two DISTINCT valid paraphrases + 1 repeat;
        # image 1: one valid (drawn twice) + one invalid
        samples = [["zim ka ro mi ?", "zim ta lu ne ?"],
                   ["zur ka ro mi ?", "zim ta lu ne ?"],
                   ["zim ka ro mi ?", "zim broken ?"]]
        m = diversity_metrics(samples, refs=refs, valid_fn=fn)
        assert m["valid_rate"] == pytest.approx(5 / 6)
        assert m["distinct_valid"] == pytest.approx((2 + 1) / 2)

    def test_absent_without_inputs(self):
        m = diversity_metrics([["a b c d", "e f g h"]])
        assert "valid_rate" not in m and "distinct_valid" not in m


class TestMappedWordConsistency:
    def test_all_words_required_per_category(self):
        """mapped_word_consistency: consistent iff the question contains ALL
        of the category's mapped words (the factored corpus names two words
        per category — benchmarks/make_flagship_dataset.py
        factored_consistency_map)."""
        from blt_vqg_tpu.train.infomax import mapped_word_consistency
        fn = mapped_word_consistency({"0": ["ka", "ro"], "1": ["mi", "ta"]})
        assert fn("pa ka de ro ?", 0)
        assert not fn("pa ka de de ?", 0)      # only one of the two
        assert not fn("pa ka de ro ?", 1)      # other category's words
        assert fn("mi ta", 1)
        assert not fn("anything", 7)           # unmapped category

    def test_json_string_keys_accepted(self):
        from blt_vqg_tpu.train.infomax import mapped_word_consistency
        fn = mapped_word_consistency({"3": ["lu"]})
        assert fn("lu ne", 3) and fn("lu ne", np.int32(3))

    def test_type_word_contexts_via_idx2word(self):
        """evaluate_iq contexts are the category word's VOCAB ID
        (data/packed.py type_word); with idx2word the lookup key is the
        decoded category name — regression for the round-4 flagship eval,
        where name-keyed maps scored 0.0 against raw word-id contexts."""
        from blt_vqg_tpu.train.infomax import mapped_word_consistency
        idx2word = {88: "cat2", 457: "cat11"}
        fn = mapped_word_consistency(
            {"cat2": ["ka", "ro"], "cat11": ["mi"]}, idx2word)
        assert fn("pa ka ro ?", 88)
        assert not fn("pa ka ro ?", 457)
        assert fn("mi mi ?", np.int32(457))
        assert not fn("ka ro", 999)            # unknown word id
