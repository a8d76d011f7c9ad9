"""Dataset layer tests over synthetic on-disk fixtures (tiny COCO-format
dataset, refcoco pickles, ReasonSeg JSONs, AVSBench tree with real wavs)."""

import json
import os
import pickle
import wave

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)

    # --- tiny COCO train2017 -------------------------------------------
    img_dir = root / "coco" / "train2017"
    ann_dir = root / "coco" / "annotations"
    img_dir.mkdir(parents=True)
    ann_dir.mkdir(parents=True)
    images, annotations = [], []
    ann_id = 1
    for img_id in range(1, 5):
        h, w = 64, 80
        arr = rng.integers(0, 255, (h, w, 3), np.uint8)
        Image.fromarray(arr).save(img_dir / f"{str(img_id).zfill(12)}.jpg")
        images.append({"id": img_id, "height": h, "width": w,
                       "file_name": f"{str(img_id).zfill(12)}.jpg"})
        for k in range(2):
            # person (k=0) covers >=10% of the image so the COCO-20i
            # min_mask_frac filter keeps it
            x0, y0 = 8 + 30 * k, 10 + 20 * k
            bw, bh = (32, 24) if k == 0 else (24, 20)
            poly = [float(x0), float(y0), float(x0 + bw), float(y0),
                    float(x0 + bw), float(y0 + bh), float(x0), float(y0 + bh)]
            annotations.append({
                "id": ann_id, "image_id": img_id,
                "category_id": 1 if k == 0 else 17,
                "segmentation": [poly], "iscrowd": 0, "area": float(bw * bh),
                "bbox": [x0, y0, float(bw), float(bh)]})
            ann_id += 1
    coco_json = {"images": images, "annotations": annotations,
                 "categories": [{"id": 1, "name": "person"},
                                {"id": 17, "name": "cat"}]}
    with open(ann_dir / "instances_train2017.json", "w") as f:
        json.dump(coco_json, f)

    # --- refcoco pickles -------------------------------------------------
    ref_dir = root / "refcoco"
    ref_dir.mkdir()
    refs = []
    for rid, (img_id, aid) in enumerate([(1, 1), (2, 3), (3, 5)]):
        refs.append({
            "ref_id": rid, "ann_id": aid, "image_id": img_id,
            "category_id": 1, "split": "train" if rid < 2 else "val",
            "file_name": f"{str(img_id).zfill(12)}.jpg",
            "sentences": [{"sent": f"the left object {rid}", "sent_id": rid,
                           "tokens": [], "raw": f"the left object {rid}"}],
            "sent_ids": [rid]})
    with open(ref_dir / "refs(unc).p", "wb") as f:
        pickle.dump(refs, f)
    with open(ref_dir / "instances.json", "w") as f:
        json.dump(coco_json, f)

    # --- ReasonSeg --------------------------------------------------------
    rs = root / "reason" / "train"
    rs.mkdir(parents=True)
    arr = rng.integers(0, 255, (48, 64, 3), np.uint8)
    Image.fromarray(arr).save(rs / "img0.jpg")
    with open(rs / "img0.json", "w") as f:
        json.dump({"text": ["the thing used for sitting"],
                   "is_sentence": True,
                   "shapes": [{"label": "target",
                               "points": [[10, 10], [40, 10], [40, 30],
                                          [10, 30]]}]}, f)
    with open(root / "reason" / "reason_answer_train.txt", "w") as f:
        f.write("a chair\n")

    # --- AVSBench S4 -------------------------------------------------------
    avs = root / "avsbench" / "Single-source"
    for sub in ("s4_data/visual_frames_original_resolution/train/cat_meowing/v1",
                "s4_data/audio_wav/train/cat_meowing",
                "s4_data/gt_masks/train/cat_meowing/v1"):
        (avs / sub).mkdir(parents=True)
    Image.fromarray(rng.integers(0, 255, (48, 64, 3), np.uint8)).save(
        avs / "s4_data/visual_frames_original_resolution/train/cat_meowing/v1/v1_1.png")
    Image.fromarray((rng.random((48, 64)) > 0.5).astype(np.uint8) * 255).save(
        avs / "s4_data/gt_masks/train/cat_meowing/v1/v1_1.png")
    with wave.open(str(avs / "s4_data/audio_wav/train/cat_meowing/v1.wav"),
                   "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        sig = (np.sin(np.arange(16000 * 5) * 0.05) * 20000).astype(np.int16)
        w.writeframes(sig.tobytes())
    with open(avs / "s4_meta_data.csv", "w") as f:
        f.write("name,vid,category,split\nv1,1,cat_meowing,train\n")

    # --- ReasonSeg val split ------------------------------------------------
    rv = root / "reason" / "val"
    rv.mkdir(parents=True)
    Image.fromarray(rng.integers(0, 255, (48, 64, 3), np.uint8)).save(
        rv / "img1.jpg")
    with open(rv / "img1.json", "w") as f:
        json.dump({"text": ["the thing used for sitting"],
                   "is_sentence": True,
                   "shapes": [{"label": "target",
                               "points": [[10, 10], [40, 10], [40, 30],
                                          [10, 30]]}]}, f)

    # --- ADE20K (2-channel instance PNG + semantic label PNG) --------------
    ade = root / "ADEChallengeData2016"
    (ade / "images/training").mkdir(parents=True)
    (ade / "annotations_instance/training").mkdir(parents=True)
    (ade / "annotations/training").mkdir(parents=True)
    Image.fromarray(rng.integers(0, 255, (48, 64, 3), np.uint8)).save(
        ade / "images/training/a.jpg")
    inst = np.zeros((48, 64, 3), np.uint8)
    inst[5:30, 5:40, 0] = 8     # channel 0: category id
    inst[5:30, 5:40, 1] = 1     # channel 1: instance id
    inst[32:46, 10:60, 0] = 8
    inst[32:46, 10:60, 1] = 2
    Image.fromarray(inst).save(ade / "annotations_instance/training/a.png")
    sem = np.zeros((48, 64), np.uint8)
    sem[5:30, 5:40] = 4
    Image.fromarray(sem).save(ade / "annotations/training/a.png")

    # --- COCO-20i FSS split list + reference-crop index ---------------------
    c20 = root / "coco_20i/lists/coco/fss_list/val"
    c20.mkdir(parents=True)
    with open(c20 / "data_list_0.txt", "w") as f:
        f.write("COCO_train2014_000000000001.jpg lbl\n"
                "COCO_train2014_000000000002.jpg lbl\n")
    from anyref_tpu.data.coco import build_ref_index
    build_ref_index(str(img_dir), str(ann_dir / "instances_train2017.json"),
                    str(root / "samples_0.05_0.25.json"),
                    box_img_threshold=0.01, mask_box_threshold=0.1)

    return str(root)


def test_coco_instance_dataset(data_root):
    from anyref_tpu.data.coco import CocoInstanceSeg
    ds = CocoInstanceSeg(os.path.join(data_root, "coco/train2017"),
                         os.path.join(data_root,
                                      "coco/annotations/instances_train2017.json"),
                         filter_area=None)
    assert len(ds) == 4
    s = ds[0]
    assert s["clip_image"].shape == (3, 224, 224)
    assert s["sam_image"].shape == (3, 1024, 1024)
    assert "[SEG]" in s["answer"]
    assert s["gt_masks"].ndim == 3


def test_refcoco_datasets(data_root):
    from anyref_tpu.data.refcoco import RefCocoTrain, RefCocoVal, RefCocoInverse
    tr = RefCocoTrain(data_root, "refcoco", split="train")
    assert len(tr) == 2
    s = tr[0]
    assert "Can you segment" in s["question"]
    assert s["answer"].endswith("[SEG].")
    va = RefCocoVal(data_root, "refcoco", split="val")
    assert len(va) == 1
    sv = va[0]
    assert sv["answer"] is None and sv["gt_masks"].shape[0] == 1
    inv = RefCocoInverse(data_root, "refcoco", split="train")
    si = inv[0]
    assert "description of the region" in si["question"]
    assert "ref_image" in si


def test_ref_index_and_image_ref(data_root):
    from anyref_tpu.data.coco import build_ref_index, CocoImageRefSeg
    idx_file = os.path.join(data_root, "samples.json")
    idx = build_ref_index(os.path.join(data_root, "coco/train2017"),
                          os.path.join(data_root,
                                       "coco/annotations/instances_train2017.json"),
                          idx_file, box_img_threshold=0.01,
                          mask_box_threshold=0.1)
    assert idx
    ds = CocoImageRefSeg(os.path.join(data_root, "coco/train2017"),
                         os.path.join(data_root,
                                      "coco/annotations/instances_train2017.json"),
                         idx_file, person_keep_frac=1.0)
    s = ds[0]
    assert "<img_ref>" in s["question"]
    assert s["ref_image"].shape == (3, 224, 224)


def test_reason_dataset(data_root):
    from anyref_tpu.data.reason import ReasonSeg
    ds = ReasonSeg(os.path.join(data_root, "reason"), split="train")
    s = ds[0]
    assert "Can you segment it" in s["question"]
    assert s["gt_masks"][0].sum() > 0


def test_avs_dataset(data_root):
    from anyref_tpu.data.avs import AVSObject
    ds = AVSObject(os.path.join(data_root, "avsbench/Single-source"),
                   split="train")
    assert len(ds) == 1
    s = ds[0]
    assert s["audio_mels"].shape == (3, 1, 128, 204)
    assert "audio" in s["question"]
    assert s["answer"] == "cat[SEG]."


def test_loader_with_collator(data_root):
    from anyref_tpu.config import anyref_tiny
    from anyref_tpu.data.coco import CocoInstanceSeg
    from anyref_tpu.data.collator import Collator
    from anyref_tpu.data.loader import DataLoader
    from anyref_tpu.tokenizer import AnyRefTokenizer
    cfg = anyref_tiny()
    ds = CocoInstanceSeg(os.path.join(data_root, "coco/train2017"),
                         os.path.join(data_root,
                                      "coco/annotations/instances_train2017.json"),
                         filter_area=None)
    ds.cfg = cfg
    dl = DataLoader(ds, Collator(AnyRefTokenizer(), cfg), batch_size=2,
                    shuffle=True, num_workers=2)
    batches = list(dl)
    assert len(batches) == 2
    b = batches[0]
    assert b["input_ids"].shape == (2, cfg.max_text_len)
    assert b["gt_masks"].shape[0] == 2


def test_loader_backpressure_bounds_readahead():
    """Ordered emission must not defeat the prefetch back-pressure: while
    batch 0 is stalled, workers may only run batches within the
    prefetch+num_workers window (an unbounded stash of completed
    out-of-order batches OOMs the host at real gt_mask sizes)."""
    import threading
    import time as _time

    from anyref_tpu.data.loader import DataLoader

    release = threading.Event()
    accessed = []

    class SlowFirst:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            accessed.append(i)
            if i == 0:
                release.wait(20)
            return i

    loader = DataLoader(SlowFirst(), collate_fn=lambda xs: xs, batch_size=1,
                        num_workers=4, prefetch=2)
    got = []

    def consume():
        got.extend(b[0] for b in loader)

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    _time.sleep(1.0)           # let workers race as far as they can
    window = loader.prefetch + loader.num_workers
    assert max(accessed) < window, (sorted(set(accessed)), window)
    release.set()
    t.join(30)
    assert got == list(range(64))   # ordered, complete


def test_refclef_image_paths():
    """refclef images resolve under saiapr_tc-12 for BOTH train and val
    entries (reference refer_seg.py:69-71); other families share
    coco/train2017."""
    from anyref_tpu.data.refcoco import _image_path
    info = {"id": 7, "file_name": "images/07/7.jpg"}
    assert _image_path("/d", "refclef", info) == \
        "/d/saiapr_tc-12/images/07/7.jpg"
    assert _image_path("/d", "refcoco", info) == \
        "/d/coco/train2017/000000000007.jpg"
    assert _image_path("/d", "refcocog", info) == \
        "/d/coco/train2017/000000000007.jpg"


def test_coco_semantic_dataset(data_root):
    from anyref_tpu.data.coco import CocoSemanticSeg
    ds = CocoSemanticSeg(os.path.join(data_root, "coco/train2017"),
                         os.path.join(data_root,
                                      "coco/annotations/instances_train2017.json"),
                         filter_area=None)
    assert len(ds) == 4
    s = ds[0]
    assert s["answer"].endswith("[SEG].")
    # instances merged per class: exactly one mask for the sampled class
    assert s["gt_masks"].shape[0] == 1 and s["gt_masks"].sum() > 0


def test_coco20i_dataset(data_root):
    """COCO-20i one-shot: query image from the FSS split list, support = a
    same-class reference crop from the prebuilt index (reference
    utils/coco20i.py:205-458)."""
    from anyref_tpu.data.coco20i import Coco20i, coco20i_split_ids
    assert 1 in coco20i_split_ids(0)     # person is a split-0 class
    ds = Coco20i(
        os.path.join(data_root, "coco/train2017"),
        os.path.join(data_root, "coco/annotations/instances_train2017.json"),
        os.path.join(data_root, "samples_0.05_0.25.json"),
        os.path.join(data_root, "coco_20i/lists/coco/fss_list"),
        split=0, mode="val")
    assert len(ds) == 2
    s = ds[0]
    assert s["answer"] == "person[SEG]."
    assert "<img_ref>" in s["question"]
    assert s["ref_image"].shape == (3, 224, 224)
    assert s["gt_masks"].shape[0] == 1 and s["gt_masks"].sum() > 0


def test_ade_datasets(data_root):
    from anyref_tpu.data.ade import AdeInstanceSeg, AdeSemanticSeg
    root = os.path.join(data_root, "ADEChallengeData2016")
    inst = AdeInstanceSeg(os.path.join(root, "images/training"),
                          os.path.join(root, "annotations_instance/training"))
    assert len(inst) == 1
    si = inst[0]
    # two instances of the same category -> two [SEG] slots, two masks
    assert si["answer"].count("[SEG]") == 2
    assert si["gt_masks"].shape[0] == 2
    sem = AdeSemanticSeg(os.path.join(root, "images/training"),
                         os.path.join(root, "annotations/training"))
    ss = sem[0]
    assert ss["answer"].endswith("[SEG].")
    assert ss["gt_masks"].shape[0] == 1 and ss["gt_masks"].sum() > 0
