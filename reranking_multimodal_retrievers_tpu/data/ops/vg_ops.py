"""Visual Genome transforms (reference `src/data_ops/vg_data_ops.py:49-195`)."""

from __future__ import annotations

from ...utils.registries import register_transform_functor
from ..transforms import HFDatasetTransform
from .m2kr_ops import make_dummy_m2kr, _load_hf


@register_transform_functor
class LoadVisualGenomeData(HFDatasetTransform):
    def setup(self, data_path=None, **kwargs):
        self.data_path = data_path
        return self

    def _call(self, data=None):
        if self.use_dummy_data or not self.data_path:
            return make_dummy_m2kr()
        return _load_hf(self.data_path)


@register_transform_functor
class PrepareVisualGenomeForRetrieval(HFDatasetTransform):
    """Region descriptions become per-image passages (reference `:117-195`)."""

    def setup(self, **kwargs):
        return self

    def _call(self, data):
        import datasets

        out = datasets.DatasetDict()
        for split in [s for s in data.keys() if not s.endswith("_passages")]:
            table = data[split]
            if "pos_item_ids" in table.column_names:
                out[split] = table
                if f"{split}_passages" in data:
                    out[f"{split}_passages"] = data[f"{split}_passages"]
                continue
            pids = [f"vg_{split}_{i}" for i in range(len(table))]
            contents = [
                (row.get("region_descriptions") or row.get("passage_content") or "")
                if not isinstance(row.get("region_descriptions"), list)
                else " ".join(row["region_descriptions"])
                for row in table
            ]
            out[split] = table.add_column("pos_item_ids", [[p] for p in pids])
            out[f"{split}_passages"] = datasets.Dataset.from_dict(
                {"passage_id": pids, "passage_content": contents}
            )
        return out
