"""Text-layer tests: vocabulary contract, tokenizer goldens, vocab build."""

import json
import os

import numpy as np
import pytest

from blt_vqg_tpu.text.vocabulary import Vocabulary, load_vocab
from blt_vqg_tpu.text.tokenizer import tokenize, process_text
from blt_vqg_tpu.text.build import build_vocab
from blt_vqg_tpu.text.glove import load_glove_embeddings


class TestVocabulary:
    def test_reserved_symbol_ids(self):
        """The 6 reserved symbols must own ids 0-5 in reference order —
        datasets are token-compatible across codebases only if this holds."""
        v = Vocabulary()
        assert v.word2idx["<pad>"] == 0
        assert v.word2idx["<start>"] == 1
        assert v.word2idx["<resp>"] == 2
        assert v.word2idx["<end>"] == 3
        assert v.word2idx["<unk>"] == 4
        assert v.word2idx["<pos>"] == 5

    def test_unk_fallback(self):
        v = Vocabulary()
        assert v("never-seen-word") == v.unk

    def test_save_load_roundtrip(self, tmp_path):
        v = Vocabulary()
        v.add_word("cat"); v.add_word("dog")
        p = str(tmp_path / "vocab.json")
        v.save(p)
        v2 = load_vocab(p)
        assert v2.word2idx == v.word2idx
        assert v2.idx2word == v.idx2word

    def test_tokens_to_words_stops_at_end(self):
        v = Vocabulary()
        cat = v.add_word("cat"); sat = v.add_word("sat")
        toks = [v.start, cat, sat, v.end, cat, cat]
        assert v.tokens_to_words(toks) == "cat sat"


class TestTokenizer:
    # golden cases for VQA-style text (nltk word_tokenize-compatible)
    CASES = [
        ("What color is the dog?", ["what", "color", "is", "the", "dog", "?"]),
        ("Is this a cat, or a dog?",
         ["is", "this", "a", "cat", ",", "or", "a", "dog", "?"]),
        ("How many people are there...", ["how", "many", "people", "are",
                                          "there", "."]),
        ("don't touch it", ["do", "n't", "touch", "it"]),
        ("it's red", ["it", "'s", "red"]),
        ("", []),
        ("yes", ["yes"]),
        ("blue and white", ["blue", "and", "white"]),
    ]

    @pytest.mark.parametrize("text,want", CASES)
    def test_goldens(self, text, want):
        assert tokenize(text) == want

    def test_process_text_wraps_and_truncates(self):
        v = Vocabulary()
        for w in ["what", "color", "is", "the", "dog", "?"]:
            v.add_word(w)
        arr, length = process_text("What color is the dog?", v, max_length=20)
        assert arr[0] == v.start and arr[-1] == v.end
        assert length == 8
        arr2, l2 = process_text("What color is the dog?", v, max_length=4)
        assert l2 == 4 and len(arr2) == 4  # truncated, <end> cut off


class TestBuildVocab:
    def test_threshold_and_answer_words(self, tmp_path):
        questions = {"questions": [
            {"question": "what color is it?"},
            {"question": "what color was it?"},
            {"question": "what color will it be?"},
            {"question": "what color could it be?"},
            {"question": "rare question here"},
        ]}
        cat2ans = {"color": ["red", "blue"], "count": ["one"]}
        qp = str(tmp_path / "q.json"); cp = str(tmp_path / "c.json")
        json.dump(questions, open(qp, "w")); json.dump(cat2ans, open(cp, "w"))
        v = build_vocab(qp, cp, threshold=4)
        # category + answer words unconditionally present
        for w in ("color", "count", "red", "blue", "one"):
            assert w in v
        # "what"/"color"/"it" appear 4x -> in; "rare" once -> out
        assert "what" in v and "rare" not in v

    def test_deterministic_ids(self, tmp_path):
        questions = {"questions": [{"question": "a b c d"}] * 4}
        cat2ans = {"x": ["y"]}
        qp = str(tmp_path / "q.json"); cp = str(tmp_path / "c.json")
        json.dump(questions, open(qp, "w")); json.dump(cat2ans, open(cp, "w"))
        v1 = build_vocab(qp, cp, threshold=4)
        v2 = build_vocab(qp, cp, threshold=4)
        assert v1.word2idx == v2.word2idx


class TestGlove:
    def test_overwrites_known_rows(self, tmp_path):
        v = Vocabulary()
        v.add_word("cat")
        p = str(tmp_path / "glove.txt")
        with open(p, "w") as f:
            f.write("cat " + " ".join(["1.5"] * 8) + "\n")
            f.write("unknownword " + " ".join(["9.9"] * 8) + "\n")
            f.write("badline 1 2\n")
        table = load_glove_embeddings(v, 8, p)
        np.testing.assert_allclose(table[v("cat")], 1.5)
        assert table.shape == (len(v), 8)
        # unlisted rows keep the small random init
        assert np.abs(table[v.pad]).max() < 0.1


class TestNamedGlove:
    def test_torchtext_cache_layout(self, tmp_path):
        """get_glove_embedding resolves torchtext's .vector_cache filename
        (reference utils/train_utils.py:102-120 capability)."""
        from blt_vqg_tpu.text.glove import get_glove_embedding
        from blt_vqg_tpu.text.vocabulary import Vocabulary
        v = Vocabulary()
        v.add_word("cat")
        cache = tmp_path / "vc"
        cache.mkdir()
        (cache / "glove.6B.4d.txt").write_text("cat 1.0 2.0 3.0 4.0\n")
        table = get_glove_embedding("6B", 4, v, cache_dir=str(cache))
        import numpy as np
        np.testing.assert_allclose(table[v.word2idx["cat"]],
                                   [1.0, 2.0, 3.0, 4.0])
