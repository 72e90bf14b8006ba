"""Unit tests for the synthetic M2KR task generator (`data/ops/synthetic_ops.py`).

Covers the text-only tail-evidence mode and the visual-key mode (VERDICT r2
#1): combo uniqueness, image determinism, phrase placement relative to the
retriever doc budget, and that answer-string containment marks exactly the
planted positive (the pseudo-relevance invariant the reference relies on,
`metrics_processors.py:712`).
"""

import os

import numpy as np
import pytest

from reranking_multimodal_retrievers_tpu.data.ops.synthetic_ops import (
    GenerateSyntheticM2KR,
)


def _gen(**kw):
    functor = GenerateSyntheticM2KR()
    functor.use_dummy_data = False
    defaults = dict(
        num_pairs=40, num_test=10, group_size=5, head_len=12, tail_len=10,
        num_distractor_keys=50, num_filler_words=30, seed=3,
    )
    defaults.update(kw)
    functor.setup(**defaults)
    return functor._call()


def test_text_mode_answer_marks_exactly_the_positive():
    dd = _gen()
    passages = {
        pid: content for pid, content in zip(
            dd["train_passages"]["passage_id"],
            dd["train_passages"]["passage_content"])
    }
    for split in ("train", "test"):
        for row in dd[split]:
            answer = row["gold_answer"]
            hits = [pid for pid, c in passages.items()
                    if f" {answer} " in f" {c} "]
            assert hits == row["pos_item_ids"]


@pytest.mark.parametrize("mode", ["head", "tail"])
def test_visual_mode_phrase_placement(mode, tmp_path):
    head_len, tail_len = 12, 10
    dd = _gen(visual_key=mode, visual_digits=3, visual_colors=8,
              images_dir=str(tmp_path), head_len=head_len, tail_len=tail_len)
    passages = {
        pid: content.split() for pid, content in zip(
            dd["train_passages"]["passage_id"],
            dd["train_passages"]["passage_content"])
    }
    seen_answers = set()
    for split in ("train", "test"):
        for row in dd[split]:
            phrase = row["gold_answer"].split()
            assert len(phrase) == 3
            # globally unique combo per query
            assert row["gold_answer"] not in seen_answers
            seen_answers.add(row["gold_answer"])
            words = passages[row["pos_item_ids"][0]]
            # contiguous occurrence, on the correct side of the doc budget
            starts = [i for i in range(len(words) - 2)
                      if words[i:i + 3] == phrase]
            assert len(starts) == 1
            if mode == "head":
                assert starts[0] + 3 <= head_len
            else:
                assert starts[0] >= head_len
            # answer containment marks exactly the positive
            text = row["gold_answer"]
            hits = [pid for pid, w in passages.items()
                    if f" {text} " in f" {' '.join(w)} "]
            assert hits == row["pos_item_ids"]
            # the query text carries no visual words (signal is image-only)
            import re
            assert not any(re.fullmatch(r"p\d+v\d+", w)
                           for w in row["question"].split())


def test_visual_mode_images_deterministic(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    for d in (a, b):
        _gen(visual_key="head", visual_digits=4, visual_colors=6,
             images_dir=str(d))
    from PIL import Image

    names = sorted(p.name for p in a.iterdir())
    assert names == sorted(p.name for p in b.iterdir())
    assert len(names) == 40
    for n in names[:5]:
        ia = np.asarray(Image.open(a / n))
        ib = np.asarray(Image.open(b / n))
        assert ia.shape == (32, 32, 3)
        np.testing.assert_array_equal(ia, ib)
    # different combos produce different images
    imgs = [np.asarray(Image.open(a / n)) for n in names[:10]]
    assert len({im.tobytes() for im in imgs}) == len(imgs)


def test_visual_mode_group_structure(tmp_path):
    group = 5
    dd = _gen(visual_key="tail", visual_digits=3, visual_colors=8,
              images_dir=str(tmp_path), group_size=group)
    contents = dd["train_passages"]["passage_content"]
    rows = list(dd["train"]) + list(dd["test"])
    assert len(contents) == len(rows) * group
    # every group member shares the head key named by the query text
    pids = dd["train_passages"]["passage_id"]
    by_pid = dict(zip(pids, contents))
    for qi, row in enumerate(rows):
        A = row["question"].split()[-1]
        members = [by_pid[f"sp{qi * group + j}"] for j in range(group)]
        assert all(A in m.split() for m in members)


def test_group_negatives_emitted_and_sampled(tmp_path):
    dd = _gen(visual_key="head", visual_digits=3, visual_colors=8,
              images_dir=str(tmp_path), emit_group_negatives=True)
    group = 5
    for split in ("train", "test"):
        for qi, row in enumerate(dd[split]):
            negs = row["neg_item_ids"]
            assert len(negs) == group - 1
            assert row["pos_item_ids"][0] not in negs

    # the DPR dataset must draw negatives from the row's hard pool
    from reranking_multimodal_retrievers_tpu.data.datasets import (
        CommonDatasetForDPR,
    )

    id2doc = dict(zip(dd["train_passages"]["passage_id"],
                      dd["train_passages"]["passage_content"]))
    ds = CommonDatasetForDPR(
        {}, dd["train"], {}, passages={"id2doc": id2doc},
        num_negative_samples=2,
    )
    for idx in range(5):
        s = ds[idx]
        pool = set(dd["train"][idx]["neg_item_ids"])
        assert set(s["neg_item_ids"]) <= pool
        assert len(s["neg_item_ids"]) == 2
        assert s["pos_item_id"] == dd["train"][idx]["pos_item_ids"][0]


def test_dummy_run_never_clobbers_real_side_artifacts(tmp_path, monkeypatch):
    """A --use_dummy_data run regenerates dummy-sized vocab/images; writing
    them to the REAL config paths silently invalidates every checkpoint
    trained against the real vocab (observed: a dummy verify run shifted all
    token ids under trained vtail checkpoints). Dummy side artifacts must be
    scoped into cache/dummy/."""
    monkeypatch.chdir(tmp_path)
    vocab = "cache/synth_vocab/vocab.txt"
    imgs = "cache/synth_imgs"

    real = GenerateSyntheticM2KR()
    real.use_dummy_data = False
    kw = dict(num_pairs=40, num_test=10, group_size=5, head_len=12,
              tail_len=10, num_distractor_keys=50, num_filler_words=30,
              seed=3, visual_key="head", visual_digits=3, visual_colors=8,
              vocab_path=vocab, images_dir=imgs)
    real.setup(**kw)
    real._call()
    real_bytes = open(vocab).read()
    real_img = sorted(os.listdir(imgs))[0]
    real_img_bytes = open(os.path.join(imgs, real_img), "rb").read()

    dummy = GenerateSyntheticM2KR()
    dummy.use_dummy_data = True
    dummy.setup(**kw)
    dummy._call()

    # real artifacts untouched; dummy copies live under cache/dummy/
    assert open(vocab).read() == real_bytes
    assert open(os.path.join(imgs, real_img), "rb").read() == real_img_bytes
    assert os.path.exists("cache/dummy/synth_vocab/vocab.txt")
    assert open("cache/dummy/synth_vocab/vocab.txt").read() != real_bytes

    # the tokenizer builder follows the same redirect in dummy mode
    from reranking_multimodal_retrievers_tpu.data.ops.common import (
        build_tokenizer,
    )

    tk_real = build_tokenizer(
        {"TokenizerClass": "BertTokenizerFast",
         "TokenizerModelVersion": "cache/synth_vocab"})
    tk_dummy = build_tokenizer(
        {"TokenizerClass": "BertTokenizerFast",
         "TokenizerModelVersion": "cache/synth_vocab"}, use_dummy_data=True)
    assert tk_real.vocab_size != tk_dummy.vocab_size
