"""2D datasets: file crawler + the reference's labeled dataset family.

Parity with ``/root/reference/medical_diffusion/data/datasets/dataset_simple_2d.py``:
* ``SimpleDataset2D``     — rglob crawler, PIL RGB loader, default transform to
  [-1, 1], items {'uid', 'source'} (:13-69).
* ``AIROGSDataset``       — eye fundus, labels from train_labels.csv, class
  NRG=0/RG=1, inverse-frequency weights (:73-101).
* ``MSIvsMSSDataset``     — colon histology, label from parent dir name
  MSIMUT=0/MSS=1 (:103-113).
* ``MSIvsMSS_2_Dataset``  — MSIH=0/nonMSIH=1 (:115-126).
* ``CheXpertDataset``     — chest X-ray, Cardiomegaly -1/0/1/NA -> [0..3]
  (:128-155).
* ``CheXpert_2_Dataset``  — preprocessed CSV join, 0/1/2 target + weights
  (:157-198).

Items are channels-last float32 numpy arrays; no torch anywhere.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, List, Optional, Sequence

import numpy as np
from PIL import Image

from medfusion_tpu.data.transforms import Compose2D


class SimpleDataset2D:
    def __init__(
        self,
        path_root,
        item_pointers: Sequence = (),
        crawler_ext: str = "tif",
        transform: Optional[Callable] = None,
        image_resize=None,
        augment_horizontal_flip: bool = False,
        augment_vertical_flip: bool = False,
        image_crop=None,
        seed: int = 0,
    ):
        self.path_root = Path(path_root)
        self.crawler_ext = crawler_ext
        self.rng = np.random.default_rng(seed)
        if len(item_pointers):
            self.item_pointers = list(item_pointers)
        else:
            self.item_pointers = self.run_item_crawler(self.path_root, crawler_ext)
        self.transform = transform or Compose2D(
            image_resize=image_resize,
            augment_horizontal_flip=augment_horizontal_flip,
            augment_vertical_flip=augment_vertical_flip,
            image_crop=image_crop,
        )

    def __len__(self):
        return len(self.item_pointers)

    def __getitem__(self, index):
        rel = Path(self.item_pointers[index])
        img = self.load_item(self.path_root / rel)
        return {"uid": rel.stem, "source": self.transform(img, self.rng)}

    def load_item(self, path_item):
        return Image.open(path_item).convert("RGB")

    @classmethod
    def run_item_crawler(cls, path_root, extension, **kwargs) -> List[Path]:
        return sorted(p.relative_to(path_root) for p in Path(path_root).rglob(f"*.{extension}"))

    def get_weights(self) -> Optional[List[float]]:
        """Per-item weights for weighted sampling; None = uniform."""
        return None


def _inverse_frequency_weights(values) -> List[float]:
    import pandas as pd

    s = pd.Series(values)
    w = 1.0 / s.value_counts(normalize=True)
    return [float(w[v]) for v in s]


class AIROGSDataset(SimpleDataset2D):
    STR_2_INT = {"NRG": 0, "RG": 1}

    def __init__(self, *args, **kwargs):
        import pandas as pd

        super().__init__(*args, **kwargs)
        self.labels = pd.read_csv(self.path_root.parent / "train_labels.csv",
                                  index_col="challenge_id")

    def __len__(self):
        return len(self.labels)

    def __getitem__(self, index):
        uid = self.labels.index[index]
        img = self.load_item(self.path_root / f"{uid}.jpg")
        target = self.STR_2_INT[self.labels.loc[uid, "class"]]
        return {"source": self.transform(img, self.rng), "target": target}

    def get_weights(self):
        return _inverse_frequency_weights(self.labels["class"].tolist())

    @classmethod
    def run_item_crawler(cls, path_root, extension, **kwargs):
        return []


class MSIvsMSSDataset(SimpleDataset2D):
    STR_2_INT = {"MSIMUT": 0, "MSS": 1}

    def __getitem__(self, index):
        rel = Path(self.item_pointers[index])
        img = self.load_item(self.path_root / rel)
        target = self.STR_2_INT[(self.path_root / rel).parent.name]
        return {"uid": rel.stem, "source": self.transform(img, self.rng), "target": target}


class MSIvsMSS_2_Dataset(SimpleDataset2D):
    STR_2_INT = {"MSIH": 0, "nonMSIH": 1}

    def __getitem__(self, index):
        rel = Path(self.item_pointers[index])
        img = self.load_item(self.path_root / rel)
        target = self.STR_2_INT[(self.path_root / rel).parent.name]
        return {"source": self.transform(img, self.rng), "target": target}


class CheXpertDataset(SimpleDataset2D):
    def __init__(self, *args, **kwargs):
        import pandas as pd

        super().__init__(*args, **kwargs)
        mode = self.path_root.name
        labels = pd.read_csv(self.path_root.parent / f"{mode}.csv", index_col="Path")
        labels = labels.loc[labels["Frontal/Lateral"] == "Frontal"].copy()
        labels.index = labels.index.str[20:]
        labels.loc[labels["Sex"] == "Unknown", "Sex"] = "Female"
        labels = labels.fillna(2)
        self.labels = labels.replace({
            "Sex": {"Male": 0, "Female": 1},
            "Frontal/Lateral": {"Frontal": 0, "Lateral": 1},
            "AP/PA": {"AP": 0, "PA": 1},
        })

    def __len__(self):
        return len(self.labels)

    def __getitem__(self, index):
        rel = self.labels.index[index]
        img = self.load_item(self.path_root / rel)
        # -1=uncertain, 0=neg, 1=pos, NA(->2) -> +1 => [0..3]
        target = int(self.labels.loc[rel, "Cardiomegaly"] + 1)
        return {"uid": str(rel), "source": self.transform(img, self.rng), "target": target}

    @classmethod
    def run_item_crawler(cls, path_root, extension, **kwargs):
        return []


class CheXpert_2_Dataset(SimpleDataset2D):
    """Preprocessed-CSV variant (the flagship training dataset,
    dataset_simple_2d.py:157-198)."""

    def __init__(self, *args, **kwargs):
        import pandas as pd

        super().__init__(*args, **kwargs)
        labels = pd.read_csv(self.path_root / "labels/cheXPert_label.csv",
                             index_col=["Path", "Image Index"])
        labels = labels.loc[labels["fold"] == "train"].copy().drop(labels="fold", axis=1)
        labels2 = pd.read_csv(self.path_root / "labels/train.csv", index_col="Path")
        labels2 = labels2.loc[labels2["Frontal/Lateral"] == "Frontal"].copy()
        labels2 = labels2[["Cardiomegaly"]].copy()
        labels2[(labels2 < 0) | labels2.isna()] = 2
        self.labels = labels.join(labels2["Cardiomegaly"], on=["Path"], rsuffix="_true")

    def __len__(self):
        return len(self.labels)

    def __getitem__(self, index):
        path_index, image_index = self.labels.index[index]
        img = self.load_item(self.path_root / "data" / f"{image_index:06}.png")
        target = int(self.labels.loc[(path_index, image_index), "Cardiomegaly"])
        return {"source": self.transform(img, self.rng), "target": target}

    def get_weights(self):
        return _inverse_frequency_weights(self.labels["Cardiomegaly"].tolist())

    @classmethod
    def run_item_crawler(cls, path_root, extension, **kwargs):
        return []
