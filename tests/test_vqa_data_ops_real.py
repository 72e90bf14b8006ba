"""Real-data-path logic of the OK-VQA ops on synthesized fixtures: ROI
selection policy, VinVL TSV loading, Oscar caption merging, OCR↔VinVL
combination (reference `src/data_ops/vqa_data_ops.py:67-261,499-598`)."""

import json
import os

import datasets
import pytest

from reranking_multimodal_retrievers_tpu.utils import ConfigDict
from reranking_multimodal_retrievers_tpu.data.ops.okvqa_ops import (
    CropRegionOfInterestImages,
    LoadGoogleOCRFeatures,
    LoadOscarCaptionFeatures,
    LoadVinVLFeatures,
    select_roi_objects,
)


def _functor(cls, **kwargs):
    f = cls(use_dummy_data=False, global_config=ConfigDict({}))
    f.setup(**kwargs)
    return f


def test_select_roi_objects_policy():
    objects = [
        {"class": "cat", "rect": [0, 0, 10, 10]},       # area 100
        {"class": "dog", "rect": [0, 0, 50, 50]},       # area 2500, biggest
        {"class": "dog", "rect": [10, 10, 20, 20]},     # contained in dog → dropped
        {"class": "tree", "rect": [0, 0, 30, 30]},      # area 900
    ]
    sel = select_roi_objects(objects, "where is the cat?", max_objects=2)
    classes = [o["class"] for o in sel]
    # question-mentioned class always selected; then largest area
    assert classes[0] == "cat"
    assert "dog" in classes
    assert len(sel) == 2
    # containment dedup: the small dog box never wins over the big one
    sel_all = select_roi_objects(objects, "nothing mentioned", max_objects=4)
    dog_rects = [o["rect"] for o in sel_all if o["class"] == "dog"]
    assert [10, 10, 20, 20] not in dog_rects


def test_crop_roi_registry():
    table = datasets.Dataset.from_dict({
        "question": ["where is the cat?"],
        "img_path": ["/nonexistent.jpg"],
        "objects": [[
            {"class": "cat", "rect": [1, 2, 3, 4]},
            {"class": "dog", "rect": [0, 0, 50, 50]},
        ]],
    })
    data = datasets.DatasetDict({"train": table})
    out = _functor(CropRegionOfInterestImages, max_objects=2)(data)
    rois = out["train"][0]["ROIs"]
    assert len(rois) == 2
    assert rois[0].startswith("/nonexistent.jpg|||cat_")
    reg = {r["id"]: r for r in out["images"]}
    assert rois[0] in reg and reg[rois[0]]["crop"] == [1, 2, 3, 4]


def test_vinvl_oscar_ocr_loaders(tmp_path):
    # VinVL TSV with a dense per-object feature that must be dropped
    tsv = tmp_path / "vinvl_train.tsv"
    pred = {"objects": [
        {"class": "cat", "rect": [0, 0, 10, 10], "conf": 0.9,
         "feature": [0.1] * 2048},
    ]}
    tsv.write_text(f"img1\t{json.dumps(pred)}\n")
    vin = _functor(LoadVinVLFeatures, VinVL_features={"train": str(tsv)})(None)
    assert "feature" not in vin["vinvl_features"]["img1"]["objects"][0]

    # Oscar captions
    cap = tmp_path / "captions.json"
    cap.write_text(json.dumps({"img1": [{"caption": "a cat"}]}))
    caps = _functor(LoadOscarCaptionFeatures,
                    caption_features={"train": str(cap)})(None)
    assert caps["caption_features"]["img1"][0]["caption"] == "a cat"

    # OCR: one region inside the cat box, one outside
    ocr_dir = tmp_path / "ocr"
    os.makedirs(ocr_dir)
    (ocr_dir / "img1_ocr.json").write_text(json.dumps({
        "filtered_text_annotations": [
            {"description": "MEOW", "vertices": [[1, 1], [4, 1], [4, 4], [1, 4]]},
            {"description": "FAR", "vertices": [[90, 90], [99, 90], [99, 99], [90, 99]]},
        ]
    }))
    combined = _functor(
        LoadGoogleOCRFeatures,
        ocr_features={"train": str(ocr_dir), "test": None,
                      "combine_with_vinvl": True},
    )(vin)
    obj = combined["vinvl_features"]["img1"]["objects"][0]
    assert obj["ocr"][0]["text"] == "MEOW"
    assert 0 < obj["ocr"][0]["score"] <= 1
    assert len(obj["ocr"]) == 1  # the far region never attaches
    assert combined["vinvl_features"]["img1"]["ocr"] == 1


def test_vg_prepare_for_retrieval_dedups_descriptions():
    """VG region phrases → deduplicated passage corpus with per-image
    positives and an 80/20 split (reference `vg_data_ops.py:117-195`)."""
    from reranking_multimodal_retrievers_tpu.data.ops.vg_ops import (
        PrepareVisualGenomeForRetrieval,
    )

    table = datasets.Dataset.from_dict({
        "img_id": ["1", "2", "3", "4", "5"],
        "img_path": [f"/img{i}.jpg" for i in range(5)],
        "descriptions": [
            ["a red car", "a tree"],
            ["a red car"],          # duplicate phrase → same passage id
            ["a dog"],
            ["a cat", "a dog"],
            ["a house"],
        ],
    })
    out = _functor(PrepareVisualGenomeForRetrieval, train_valid_ratio=0.8)(
        datasets.DatasetDict({"train": table})
    )
    passages = out["train_passages"]
    # 5 unique phrases across 7 mentions
    assert len(passages) == 5
    assert len(out["train"]) == 4 and len(out["valid"]) == 1
    # duplicate phrase shares one id across images
    id_of = dict(zip(passages["passage_content"], passages["passage_id"]))
    rows = {r["img_id"]: r for r in out["train"]}
    rows.update({r["img_id"]: r for r in out["valid"]})
    assert id_of["a red car"] in rows["1"]["pos_item_ids"]
    assert id_of["a red car"] in rows["2"]["pos_item_ids"]


def test_select_roi_objects_ignores_classless():
    # '' is a substring of every question; classless objects must not be
    # treated as question-mentioned
    objects = [
        {"rect": [0, 0, 1, 1]},                      # no class
        {"class": "", "rect": [0, 0, 2, 2]},         # empty class
        {"class": "cat", "rect": [0, 0, 10, 10]},
    ]
    sel = select_roi_objects(objects, "where is the cat?", max_objects=1)
    assert [o.get("class") for o in sel] == ["cat"]


def test_google_search_annotations_train_drop_vs_test_sentinel():
    """Reference `vqa_data_ops.py:880-895`: unmatched questions are dropped
    in train mode and get the sentinel first passage with use_all_samples."""
    from reranking_multimodal_retrievers_tpu.data.ops.okvqa_ops import (
        LoadGoogleSearchAnnotations,
    )

    def make_inputs():
        questions = datasets.DatasetDict({
            "train": datasets.Dataset.from_dict({
                "question_id": ["q1", "q2"],
                "question": ["a?", "b?"],
                "answers": [["paris"], ["zzz-nomatch"]],
            }),
        })
        passages = datasets.DatasetDict({
            "train_passages": datasets.Dataset.from_dict({
                "passage_id": ["p1", "p2"],
                "passage_content": ["paris is in france", "other text"],
            }),
        })
        return [questions, passages]

    out = _functor(LoadGoogleSearchAnnotations)(make_inputs())
    assert list(out["train"]["question_id"]) == ["q1"]      # q2 dropped
    assert list(out["train"]["pos_item_ids"]) == [["p1"]]

    out = _functor(LoadGoogleSearchAnnotations, use_all_samples=True)(
        make_inputs())
    assert list(out["train"]["question_id"]) == ["q1", "q2"]
    assert list(out["train"]["pos_item_ids"][1]) == ["p1"]  # sentinel
