"""Tools (analysis, mcnemar, evqa eval, job gen) + observability + NaN guard."""

import os

import numpy as np
import pytest

from reranking_multimodal_retrievers_tpu.tools.analysis import (
    rerank_vs_list_size,
    mcnemar_test,
    loss_vs_recall,
)
from reranking_multimodal_retrievers_tpu.tools.eval_evqa import (
    token_f1,
    answers_equivalent,
    evqa_scores,
)
from reranking_multimodal_retrievers_tpu.tools.submit_jobs import render_job
from reranking_multimodal_retrievers_tpu.utils.observability import (
    MetricsHistoryLogger,
    profile_trace,
    maybe_wandb,
)
from reranking_multimodal_retrievers_tpu.utils.config_system import ConfigDict


def _entry(qid, order, pos, raw_order=None):
    def plist(ids):
        return [{"passage_id": p, "content": f"text {p}", "score": -i}
                for i, p in enumerate(ids)]
    e = {
        "question_id": qid,
        "top_ranking_passages": plist(order),
        "pos_item_ids": pos,
        "answers": [pos[0]],
    }
    if raw_order:
        e["raw_top_ranking_passages"] = plist(raw_order)
    return e


def test_mcnemar():
    preds = [
        _entry("q1", ["a", "b"], ["a"], raw_order=["b", "a"]),  # both hit @2
        _entry("q2", ["x", "y"], ["z"], raw_order=["z", "x"]),  # raw hit, rerank miss
    ] * 5
    res = mcnemar_test(preds, k=1)
    assert res["b"] == 5 and res["c"] == 5  # q1: raw@1 miss, rerank@1 hit; q2 opposite
    assert 0 <= res["p_value"] <= 1


def test_rerank_vs_list_size():
    retrieval = [_entry("q1", ["a", "b", "c"], ["c"])]
    # reranker scores c highest
    rerank = [{
        "question_id": "q1",
        "top_ranking_passages": [
            {"passage_id": "c", "content": "text c", "score": 9.0},
            {"passage_id": "a", "content": "text a", "score": 1.0},
            {"passage_id": "b", "content": "text b", "score": 0.0},
        ],
    }]
    out = rerank_vs_list_size(retrieval, rerank, Ds=[1, 3], k=1, use_answers=False)
    assert out[1] == 0.0  # top-1 retrieval list doesn't contain c
    assert out[3] == 1.0  # reranking top-3 surfaces c


def test_evqa_eval():
    assert token_f1("the red car", "red car") > 0.7
    assert answers_equivalent("Two dogs", "2 dogs")
    assert not answers_equivalent("paris", "rome")
    s = evqa_scores(["paris", "roma"], ["paris", "rome"])
    assert s["evqa_accuracy"] == 0.5


def test_loss_vs_recall(tmp_path):
    import json

    p = tmp_path / "preds.json"
    p.write_text(json.dumps({"predictions": [_entry("q", ["a"], ["a"])]}))
    rows = loss_vs_recall([str(p)], [0.3], k=1)
    assert rows[0]["recall_at_1"] == 1.0


def test_render_job(tmp_path):
    path = render_job("configs/okvqa_flmr.json", "test", "smoke",
                      dummy=True, out_dir=str(tmp_path))
    text = open(path).read()
    assert "--use_dummy_data" in text
    assert "limit_test_batches=1" in text
    assert os.access(path, os.X_OK)


def test_observability():
    hist = MetricsHistoryLogger()
    hist.log_metrics({"loss": 1.0}, step=1)
    hist.log_metrics({"loss": 0.5}, step=2)
    assert hist.latest("loss") == 0.5
    with profile_trace(label="t"):
        pass
    run = maybe_wandb(ConfigDict({"meta": {"logger_enable": []}}))
    run.log({"x": 1})
    run.finish()


def test_nan_guard_skips_bad_step():
    import jax
    import jax.numpy as jnp
    import optax
    from reranking_multimodal_retrievers_tpu.training.train_state import (
        TrainState, make_train_step,
    )
    import flax.struct

    @flax.struct.dataclass
    class Out:
        loss: jax.Array
        in_batch_negative_loss: jax.Array
        scores: jax.Array

    def apply_fn(params, x=None, num_negative_examples=1,
                 use_in_batch_negatives=True, gather_axis_name=None):
        loss = jnp.sum(params["w"] * x)
        return Out(loss=loss, in_batch_negative_loss=loss, scores=loss[None])

    tx = optax.sgd(0.1)
    params = {"w": jnp.ones((2,))}
    step = make_train_step(apply_fn, tx, mesh=None, loss_key="loss")
    state = TrainState.create(params, tx)
    state, m = step(state, {"x": jnp.asarray([1.0, 1.0])})
    assert m["grads_finite"] == 1.0
    w_after = np.asarray(state.params["w"]).copy()
    state, m = step(state, {"x": jnp.asarray([jnp.nan, 1.0])})
    assert m["grads_finite"] == 0.0
    np.testing.assert_array_equal(np.asarray(state.params["w"]), w_after)


def test_evqa_em_and_bem_interface(tmp_path):
    """EVQA evaluation parity surface (reference `evaluation_utils.py:178-399`):
    preprocessing, single/multi-answer EM, and the BEM scorer interface."""
    from reranking_multimodal_retrievers_tpu.tools.eval_evqa import (
        BEMScorer,
        encyclopedic_vqa_evaluation_function,
        exact_match_scoring_function,
        multianswer_exact_match,
        preprocess_answer,
        singleanswer_exact_match,
    )
    from reranking_multimodal_retrievers_tpu.models.bert import BertConfig
    from reranking_multimodal_retrievers_tpu.models.tokenization import (
        tiny_bert_tokenizer,
    )

    # preprocessing quirks: answer prefix, llm span prefix, digit map
    assert preprocess_answer("The answer is Paris!") == "paris"
    assert preprocess_answer("<extra_id_0> two cats") == "2 cats"
    assert preprocess_answer("entailment") == "yes"

    assert singleanswer_exact_match("the dog", "dog")
    assert not singleanswer_exact_match("dog", "cat")
    # multi-answer: IoU >= 0.5 over && refs vs , / and / & candidates
    assert multianswer_exact_match("cat && dog", "dog and cat")
    assert multianswer_exact_match("cat && dog", "cat")  # IoU 0.5
    assert not multianswer_exact_match("cat && dog && bird", "cat")

    ex = {"question_type": "multi_answer", "reference": "cat && dog",
          "candidate": "cat, dog"}
    assert exact_match_scoring_function(ex)

    # BEM scorer interface (random weights — exercises encode + head)
    tok = tiny_bert_tokenizer(str(tmp_path), ["cat", "dog", "what", "animal"])
    bem = BEMScorer(tok, bert_config=BertConfig.tiny(type_vocab_size=4))
    ex2 = {"question": "what animal", "reference": "cat", "candidate": "dog",
           "question_type": "automatic"}
    score = bem(ex2, threshold_score=False)
    assert 0.0 <= score <= 1.0
    # EM short-circuit: exact matches never reach BEM
    ex3 = {"question": "what animal", "reference": "cat", "candidate": "the cat",
           "question_type": "automatic"}
    assert encyclopedic_vqa_evaluation_function(ex3, bem) == 1.0


def test_fetch_and_bridge_config_resolves_tokenizer_statics(tmp_path):
    """flmr_config_from_hf must resolve instruction_token_id and the
    punctuation skiplist from the checkpoint's tokenizers — leaving the
    defaults would make both maskings silently inert."""
    import json
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import fetch_and_bridge as fb

    from reranking_multimodal_retrievers_tpu.models.tokenization import (
        tiny_bert_tokenizer, instruction_token_id,
    )

    tok = tiny_bert_tokenizer(str(tmp_path), ["question", "use", "image"])
    for sub in ("query_tokenizer", "context_tokenizer"):
        tok.save_pretrained(str(tmp_path / sub))
    hf_cfg = {
        "text_config": {"vocab_size": tok.vocab_size, "hidden_size": 32,
                        "num_hidden_layers": 1, "num_attention_heads": 2,
                        "intermediate_size": 64},
        "vision_config": {"hidden_size": 32, "intermediate_size": 64,
                          "num_hidden_layers": 1, "num_attention_heads": 2,
                          "image_size": 32, "patch_size": 16},
        "dim": 16,
        "mask_punctuation": True,
        "mask_instruction_token": ":",
    }
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(hf_cfg))

    cfg = fb.flmr_config_from_hf(str(cfg_path))
    assert cfg.mask_instruction
    assert cfg.instruction_token_id == instruction_token_id(tok, ":")
    assert cfg.instruction_token_id >= 0
    assert len(cfg.punctuation_token_ids) > 0


def test_upload_model_to_hub(tmp_path):
    """Upload tool: idempotent repo creation + folder push via injected api
    (reference `tools/upload_model_to_hub.py`), offline-safe."""
    from reranking_multimodal_retrievers_tpu.tools.upload_model_to_hub import (
        upload_folder,
    )

    calls = []

    class FakeApi:
        def create_repo(self, **kw):
            calls.append(("create", kw))

        def upload_folder(self, **kw):
            calls.append(("upload", kw))

    (tmp_path / "params").write_text("x")
    repo = upload_folder(str(tmp_path), "org/model", private=True,
                         api=FakeApi())
    assert repo == "org/model"
    assert calls[0] == ("create", {"repo_id": "org/model",
                                   "repo_type": "model", "private": True,
                                   "exist_ok": True})
    assert calls[1][1]["folder_path"] == str(tmp_path)
    with pytest.raises(FileNotFoundError):
        upload_folder(str(tmp_path / "missing"), "org/model", api=FakeApi())


def test_reduce_retrieval_file(tmp_path):
    """reduce tool strips content + pickles; both dump layouts survive
    (reference `src/tools/reduce_retrieval_result_file_size.py:1-35`)."""
    import json
    import pickle

    from reranking_multimodal_retrievers_tpu.tools.reduce_retrieval_file import (
        reduce_retrieval_file,
    )

    entries = [_entry("q1", ["p1", "p2"], ["p1"], raw_order=["p2", "p1"])]
    for key in ("output", "predictions"):
        path = tmp_path / f"{key}.json"
        path.write_text(json.dumps({key: entries}))
        target = reduce_retrieval_file(str(path))
        assert target.endswith(".pkl")
        with open(target, "rb") as f:
            reduced = pickle.load(f)
        for p in reduced[key][0]["top_ranking_passages"]:
            assert set(p) == {"passage_id", "score"}
        for p in reduced[key][0]["raw_top_ranking_passages"]:
            assert "content" not in p
        assert os.path.getsize(target) < os.path.getsize(path) * 2


def test_convert_wit_image_pixels(tmp_path):
    """b64 TSV shards -> md5-named jpgs, bad/too-small rows skipped
    (reference `src/tools/convert_wit_data.py:13-64`)."""
    import base64
    import hashlib
    import io

    from PIL import Image

    from reranking_multimodal_retrievers_tpu.data.ops.wit_ops import (
        ConvertWITImagePixels,
    )

    def b64_img(w, h):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), (120, 30, 200)).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    pixels = tmp_path / "pixels"
    images = tmp_path / "images"
    pixels.mkdir()
    rows = [
        ("http://a/ok.png", b64_img(32, 24), "m"),
        ("http://a/small.png", b64_img(4, 4), "m"),   # under min_side
        ("http://a/bad.png", "not-base64-image!", "m"),  # decode failure
    ]
    (pixels / "shard0.tsv").write_text(
        "\n".join("\t".join(r) for r in rows))

    fn = ConvertWITImagePixels(use_dummy_data=False, global_config={})
    fn.setup(pixels_dir=str(pixels), images_dir=str(images))
    manifest = fn()

    ok_id = hashlib.md5(b"http://a/ok.png").hexdigest()
    assert manifest["image_id"] == [ok_id]
    saved = Image.open(images / f"{ok_id}.jpg")
    assert saved.size == (32, 24)
    assert len(list(images.iterdir())) == 1


def test_init_retrieve_accepts_reference_output_format(tmp_path):
    """Static retrieval loads reference-produced dumps ({"output": [...]},
    json or the reduce-tool pickle) in addition to this framework's
    {"predictions": [...]} layout (reference `Reranker_base_executor.py:244-271`)."""
    import json
    import pickle

    from reranking_multimodal_retrievers_tpu.executors.reranker_executor import (
        RerankerExecutor,
    )

    entries = [_entry("q7", ["p3", "p1"], ["p1"])]
    json_path = tmp_path / "ref_dump.json"
    json_path.write_text(json.dumps({"output": entries}))
    pkl_path = tmp_path / "ref_dump.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump({"output": entries}, f)

    for path in (json_path, pkl_path):
        ex = object.__new__(RerankerExecutor)
        ex.config = ConfigDict(
            {"model_config": {"retrieve_result_path": str(path)}})
        ex.use_dummy_data = False
        ex.init_retrieve()
        assert [p["passage_id"] for p in ex.questionId2topPassages["q7"]] == [
            "p3", "p1"]


def test_init_retrieve_gzip_fallback(tmp_path):
    """A config pointing at ``x.json`` transparently loads ``x.json.gz``
    when only the gzipped dump exists (large static-retrieval lists are
    committed gzipped — .gitignore note), and an explicit ``.json.gz``
    path loads directly."""
    import gzip
    import json

    from reranking_multimodal_retrievers_tpu.executors.reranker_executor import (
        RerankerExecutor,
    )

    entries = {"q9": [{"passage_id": "p2", "score": 1.0},
                      {"passage_id": "p5", "score": 0.5}]}
    gz_path = tmp_path / "static.json.gz"
    with gzip.open(gz_path, "wt") as f:
        json.dump(entries, f)

    for path in (tmp_path / "static.json", gz_path):  # fallback + explicit
        ex = object.__new__(RerankerExecutor)
        ex.config = ConfigDict(
            {"model_config": {"retrieve_result_path": str(path)}})
        ex.use_dummy_data = False
        ex.init_retrieve()
        assert [p["passage_id"] for p in ex.questionId2topPassages["q9"]] == [
            "p2", "p5"]


def test_static_retrieve_resolves_stripped_content():
    """Entries from reduced static files (no ``content``) are re-resolved
    from the passage corpus by static_retrieve."""
    from reranking_multimodal_retrievers_tpu.executors.reranker_executor import (
        RerankerExecutor,
    )

    ex = object.__new__(RerankerExecutor)
    ex.docs_to_rerank = 3
    ex.id2doc = {"p1": "text one", "p2": "text two"}
    ex.questionId2topPassages = {
        "q1": [{"passage_id": "p1", "score": 0.9},
               {"passage_id": "p2", "score": 0.5}]
    }
    docs = ex.static_retrieve("q1")
    assert len(docs) == 3  # padded by replication to docs_to_rerank
    assert docs[0]["content"] == "text one"
    assert docs[1]["content"] == "text two"
    assert docs[2]["content"] == "text one"
    # entries that already carry content are untouched
    ex.questionId2topPassages["q1"][0]["content"] = "preloaded"
    assert ex.static_retrieve("q1")[0]["content"] == "preloaded"


def test_prepare_cc_images(tmp_path):
    """Thread-pooled URL fetch with injectable fetcher (reference
    `src/tools/prepare_conceptual_caption_images.py:18-65`), offline-safe:
    failures counted, existing files skipped."""
    from PIL import Image

    from reranking_multimodal_retrievers_tpu.tools.prepare_cc_images import (
        fetch_images,
    )

    def fake_fetch(url):
        if url.endswith("bad"):
            return None
        return Image.new("RGB", (16, 16), (10, 20, 30))

    rows = [("a", "http://x/a"), ("b", "http://x/bad"), ("c", "http://x/c")]
    out = fetch_images(rows, str(tmp_path / "imgs"), num_threads=2,
                       fetch_fn=fake_fetch)
    assert out["saved"] == ["a", "c"] and out["failed"] == ["b"]
    assert Image.open(tmp_path / "imgs" / "a.jpg").size == (16, 16)
    # second pass skips what exists
    out2 = fetch_images(rows, str(tmp_path / "imgs"), num_threads=2,
                        fetch_fn=fake_fetch)
    assert out2["skipped"] == 2 and out2["failed"] == ["b"]
