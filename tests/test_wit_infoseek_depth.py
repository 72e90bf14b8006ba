"""Real-data-path depth: WIT join/group/split semantics and the BLIP-2
greedy captioner (reference `wit_data_ops.py:62-1408`,
`infoseek_data_ops.py:673-1133`)."""

import datasets
import numpy as np
import pytest

from reranking_multimodal_retrievers_tpu.utils import ConfigDict
from reranking_multimodal_retrievers_tpu.data.ops.wit_ops import (
    PrepareWITDataForRetrieval,
    SplitWITPassagesForLargeScaleTraining,
    TruncateWITPassages,
    RemoveWITPassagesWithoutImages,
)


def _functor(cls, **kwargs):
    f = cls(use_dummy_data=False, global_config=ConfigDict({}))
    f.setup(**kwargs)
    return f


def _wit_fixture():
    rows = {
        "original_data_id": ["train_0", "train_1", "train_2"],
        "image_id": ["imgA", "imgA", "imgB"],  # imgA has two passages
        "img_id": ["imgA", "imgA", "imgB"],
        "img_path": ["/a.jpg", "/a.jpg", "/b.jpg"],
    }
    passages = {
        "original_data_id": ["train_0", "train_1", "train_2"],
        "passage_id": ["WIT_0", "WIT_1", "WIT_2"],
        "passage_content": ["first passage", "second passage", "third passage"],
    }
    return datasets.DatasetDict({
        "train": datasets.Dataset.from_dict(rows),
        "valid": datasets.Dataset.from_dict(
            {k: v[2:] for k, v in rows.items()}
        ),
        "test": datasets.Dataset.from_dict(
            {k: v[2:] for k, v in rows.items()}
        ),
        "passages": datasets.Dataset.from_dict(passages),
    })


def test_prepare_wit_groups_passages_per_image():
    out = _functor(PrepareWITDataForRetrieval)(_wit_fixture())
    train = {r["img_id"]: r for r in out["train"]}
    # imgA aggregated both of its passages into pos_item_ids
    assert sorted(train["imgA"]["pos_item_ids"]) == ["WIT_0", "WIT_1"]
    assert train["imgA"]["question_id"] == "imgA"
    assert train["imgB"]["pos_item_ids"] == ["WIT_2"]
    assert "pos_item_contents" in out["train"].column_names


def test_split_wit_passages_reduces_eval_corpus():
    prepared = _functor(PrepareWITDataForRetrieval)(_wit_fixture())
    out = _functor(SplitWITPassagesForLargeScaleTraining)(prepared)
    # train keeps the FULL corpus; valid/test reduce to referenced passages
    assert len(out["train_passages"]) == 3
    assert set(out["valid_passages"]["passage_id"]) == {"WIT_2"}
    assert set(out["test_passages"]["passage_id"]) == {"WIT_2"}


def test_truncate_wit_passages_chunks_and_reids():
    data = datasets.DatasetDict({
        "passages": datasets.Dataset.from_dict({
            "passage_id": ["orig_a", "orig_b"],
            "passage_content": ["w " * 25, "short text"],
        })
    })
    out = _functor(TruncateWITPassages, truncation_length=10)(data)
    ds = out["passages"]
    assert len(ds) == 4  # 25 words → 3 chunks of ≤10, plus the short one
    assert all(pid.startswith("WIT_") for pid in ds["passage_id"])
    assert all(len(c.split()) <= 10 for c in ds["passage_content"])


def test_remove_wit_passages_without_images():
    data = {
        "passages": datasets.Dataset.from_dict({
            "passage_id": ["p0", "p1"],
            "passage_content": ["a", "b"],
        }),
        "available_documents": {"p1": 1},
    }
    out = _functor(RemoveWITPassagesWithoutImages)(data)
    assert list(out["passages"]["passage_id"]) == ["p1"]
    assert len(out["full_passages"]) == 2


def test_blip2_greedy_captions_tiny():
    from PIL import Image

    from reranking_multimodal_retrievers_tpu.data.ops.infoseek_ops import (
        blip2_greedy_captions,
    )
    from reranking_multimodal_retrievers_tpu.models.blip2 import (
        Blip2Config, Blip2ForConditionalGeneration,
    )
    from reranking_multimodal_retrievers_tpu.models.tokenization import (
        tiny_bert_tokenizer,
    )
    import jax
    import tempfile

    cfg = Blip2Config.tiny()
    model = Blip2ForConditionalGeneration(cfg)
    import jax.numpy as jnp

    ids = jnp.ones((1, 2), jnp.int32)
    am = jnp.ones((1, 2), jnp.int32)
    dec = jnp.zeros((1, 1), jnp.int32)
    pix = jnp.zeros((1, 3, cfg.vision_config.image_size,
                     cfg.vision_config.image_size), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), ids, am, dec, pixel_values=pix)["params"]

    with tempfile.TemporaryDirectory() as td:
        tok = tiny_bert_tokenizer(td, ["a", "b", "c"])
        imgs = [Image.new("RGB", (32, 32), c) for c in ("red", "blue")]
        caps = blip2_greedy_captions(
            model, params, tok, imgs, max_new_tokens=4,
            image_size=cfg.vision_config.image_size,
        )
    assert len(caps) == 2
    assert all(isinstance(c, str) for c in caps)


def test_distillation_live_teacher_scores():
    """Live-teacher distillation: FLMR scores (1 pos + N sampled negs) per
    question (reference `distillation_data_ops.py:230-390`)."""
    from reranking_multimodal_retrievers_tpu.data.ops.distillation_ops import (
        PrepareDistillationScores,
    )
    from reranking_multimodal_retrievers_tpu.data.ops.m2kr_ops import make_dummy_m2kr

    data = make_dummy_m2kr(num_rows=4, num_passages=8)
    f = _functor(
        PrepareDistillationScores,
        flmr_config={
            "text_config": {"vocab_size": 30522, "hidden_size": 32,
                            "num_hidden_layers": 1, "num_attention_heads": 4,
                            "intermediate_size": 64},
            "vision_config": {"hidden_size": 32, "intermediate_size": 64,
                              "num_hidden_layers": 1, "num_attention_heads": 4,
                              "image_size": 32, "patch_size": 16},
            "dim": 16,
            "use_vision_encoder": False,
        },
        num_negatives=2,
        query_maxlen=16,
        doc_maxlen=24,
    )
    out = f(data)
    row = out["train"][0]
    assert len(row["neg_item_ids"]) == 2
    assert len(row["scores"]) == 3  # 1 pos + 2 negs
    assert all(np.isfinite(s) for s in row["scores"])

# ---------------------------------------------------------------- new depth


def test_feature_store_roundtrip(tmp_path):
    from reranking_multimodal_retrievers_tpu.data.feature_store import FeatureStore

    store = FeatureStore(str(tmp_path), index_name="t")
    store.put("img_1", np.arange(4, dtype=np.float32))
    store.put("img/we?ird", {"caption": "a cat"})
    assert "img_1" in store and "img/we?ird" in store
    np.testing.assert_array_equal(store.get("img_1"),
                                  np.arange(4, dtype=np.float32))
    assert store.get("img/we?ird") == {"caption": "a cat"}
    assert store.get("missing") is None
    assert len(store) == 2


def test_load_wit_passages_renders_content():
    from reranking_multimodal_retrievers_tpu.data.ops.wit_ops import LoadWITPassages

    rows = {
        "page_title": ["Cats", "Dogs"],
        "section_title": ["Breeds", None],
        "hierarchical_section_title": [None, None],
        "caption_reference_description": ["a cat photo", None],
        "caption_attribution_description": [None, None],
        "caption_alt_text_description": [None, None],
        "context_page_description": ["All about cats.", "All about dogs."],
    }
    ds = datasets.DatasetDict({
        "train": datasets.Dataset.from_dict(rows),
        "valid": datasets.Dataset.from_dict({k: v[:1] for k, v in rows.items()}),
    })
    out = _functor(LoadWITPassages)(ds)
    assert out["passages"]["passage_id"] == ["WIT_0", "WIT_1", "WIT_2"]
    first = out["passages"]["passage_content"][0]
    # field order: title, section title, caption reference, content
    assert first.index("title: Cats") < first.index("section title: Breeds")
    assert first.index("caption reference description: a cat photo") < \
        first.index("content: All about cats.")
    assert "section title" not in out["passages"]["passage_content"][1]


def test_wit_annotations_reduce_and_image_registry(tmp_path):
    from reranking_multimodal_retrievers_tpu.data.ops.wit_ops import (
        IndexWITPassagesWithElasticSearch,
        PrepareWITPassageAnnotations,
        ReduceWITPassagesSize,
        ReduceWITImagesSize,
        ConcatenateImageCorpus,
        PrepareImagesForWITData,
    )

    passages = datasets.Dataset.from_dict({
        "passage_id": ["WIT_0", "WIT_1", "WIT_2"],
        "passage_content": ["the red fox", "a blue whale", "green trees"],
        "image_id": ["imgA", "imgB", "imgC"],
    })
    questions = datasets.Dataset.from_dict({
        "question": ["what color is the fox"],
        "answers": [["red"]],
        "image_id": ["imgA"],
        "img_path": ["/nonexistent.jpg"],
    })
    data = datasets.DatasetDict({"train": questions, "passages": passages})

    indexed = _functor(IndexWITPassagesWithElasticSearch)(
        datasets.DatasetDict({"train_passages": passages}))
    annotated = _functor(PrepareWITPassageAnnotations, k=2)([data, indexed])
    assert annotated["train"]["pos_item_ids"][0] == ["WIT_0"]  # contains "red"
    assert "WIT_0" in annotated["available_documents"]

    reduced = _functor(ReduceWITPassagesSize)(annotated)
    kept = set(reduced["train_passages"]["passage_id"])
    assert "WIT_0" in kept and len(kept) < 3
    assert len(reduced["full_passages"]) == 3

    # image registry from rows, unvalidated (no files on disk)
    with_images = _functor(PrepareImagesForWITData, validate=False)(reduced)
    assert "imgA" in with_images["images"]

    shrunk = _functor(ReduceWITImagesSize)(with_images)
    assert set(shrunk["images"].keys()) <= {"imgA", "imgB", "imgC"}
    assert "imgId2path" in shrunk

    merged = _functor(ConcatenateImageCorpus)([
        {"images": {"x": {"img_id": "x", "img_path": "/x.jpg"}}},
        {"images": {"y": {"img_id": "y", "img_path": "/y.jpg"}}},
    ])
    assert set(merged["images"].keys()) == {"x", "y"}


def test_vit_v2_cache_and_v3_corpus(tmp_path):
    from reranking_multimodal_retrievers_tpu.data.ops.feature_ops import (
        ExtractImageFeaturesWithViTv2, ExtractImageFeaturesWithViTv3,
    )

    rows = datasets.DatasetDict({
        "train": datasets.Dataset.from_dict({
            "image_id": ["a", "b"],
            "img_path": ["", ""],  # missing files → blank images
        }),
    })
    f = _functor(ExtractImageFeaturesWithViTv2,
                 cache_folder=str(tmp_path), batch_size=2)
    out = f(rows)
    feats1 = np.asarray(out["train"]["image_features"])
    assert feats1.shape[0] == 2
    # second pass must restore from the store, not recompute: poison the
    # stored value and verify it is what comes back
    f.store.put("a", np.zeros_like(feats1[0]))
    out2 = f(rows)
    np.testing.assert_allclose(np.asarray(out2["train"]["image_features"][0]), 0)

    f3 = _functor(ExtractImageFeaturesWithViTv3,
                  cache_folder=str(tmp_path / "v3"), batch_size=2)
    out3 = f3(rows)
    table = out3["image_dataset_with_embeddings"]
    assert sorted(table["image_id"]) == ["a", "b"]
    assert len(table["image_features"][0]) > 0


def test_vae_features():
    from reranking_multimodal_retrievers_tpu.data.ops.feature_ops import (
        ExtractImageFeaturesWithVAE,
    )

    rows = datasets.DatasetDict({
        "train": datasets.Dataset.from_dict({"img_path": ["", ""]}),
    })
    out = _functor(ExtractImageFeaturesWithVAE, latent_dim=8,
                   image_size=32, batch_size=2)(rows)
    feats = np.asarray(out["train"]["vae_features"])
    assert feats.shape == (2, 8)
    assert np.isfinite(feats).all()


def test_caption_v2_publishes_and_v3_resumes(tmp_path):
    from reranking_multimodal_retrievers_tpu.data.ops.infoseek_ops import (
        CaptionImageWithBLIP2v2, CaptionImageWithBLIP2v3,
    )

    rows = datasets.DatasetDict({
        "train": datasets.Dataset.from_dict({
            "image_id": ["a", "b"],
            "img_path": ["", ""],
        }),
    })
    # dummy mode → deterministic placeholder captions, published to the store
    f2 = CaptionImageWithBLIP2v2(use_dummy_data=True,
                                 global_config=ConfigDict({}))
    f2.setup(caption_store_dir=str(tmp_path))
    out = f2(rows)
    assert f2.store.get("a") == out["train"]["caption"][0]

    # v3: a pre-seeded caption must survive (not be re-generated)
    f3 = CaptionImageWithBLIP2v3(use_dummy_data=True,
                                 global_config=ConfigDict({}))
    f3.setup(caption_store_dir=str(tmp_path / "v3"))
    f3.store.put("a", "hand-written caption")
    out3 = f3(rows)
    caps = dict(zip(out3["train"]["image_id"], out3["train"]["caption"]))
    assert caps["a"] == "hand-written caption"
    assert caps["b"]  # generated for the missing one


def test_feature_store_type_changing_overwrite(tmp_path):
    """put() must not leave a stale other-extension file shadowing the
    new value."""
    import numpy as np

    from reranking_multimodal_retrievers_tpu.data.feature_store import (
        FeatureStore,
    )

    store = FeatureStore(str(tmp_path), index_name="x")
    store.put("k", np.ones(3))
    store.put("k", "a caption")
    assert store.get("k") == "a caption"
    assert len(list(store.keys())) == 1
    store.put("k", np.zeros(2))
    np.testing.assert_array_equal(store.get("k"), np.zeros(2))
    assert len(list(store.keys())) == 1


def test_prepare_wit_real_schema_without_img_columns():
    """The real-data path: LoadWITData produces image_id/original_data_id
    but never img_id/img_path — those must come from the image registry
    (PrepareImagesForWITData) or fall back to image_id/None instead of
    KeyErroring."""
    fx = _wit_fixture()
    for split in ("train", "valid", "test"):
        fx[split] = fx[split].remove_columns(["img_id", "img_path"])
    fx_with_registry = datasets.DatasetDict(fx)
    fx_with_registry["images"] = {
        "imgA": {"img_id": "imgA", "img_path": "/reg/a.jpg"},
        "imgB": {"img_id": "imgB", "img_path": "/reg/b.jpg"},
    }
    out = _functor(PrepareWITDataForRetrieval)(fx_with_registry)
    train = {r["img_id"]: r for r in out["train"]}
    assert set(train) == {"imgA", "imgB"}
    assert train["imgA"]["img_path"] == "/reg/a.jpg"
    assert sorted(train["imgA"]["pos_item_ids"]) == ["WIT_0", "WIT_1"]

    # no registry at all: img_id falls back to image_id, img_path to None
    fx2 = _wit_fixture()
    for split in ("train", "valid", "test"):
        fx2[split] = fx2[split].remove_columns(["img_id", "img_path"])
    out2 = _functor(PrepareWITDataForRetrieval)(fx2)
    assert {r["img_id"] for r in out2["train"]} == {"imgA", "imgB"}
