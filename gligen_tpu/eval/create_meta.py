"""Eval scenario generation (reference demo/gligen/create_meta.py).

Exports CLI-consumable meta JSON (prompt + phrases + normalized boxes per
item) from an eval dataset, so quantitative runs share the exact
inference surface of `gligen_tpu.inference.cli`.
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, List, Optional


def metas_from_dataset(
    dataset,
    ckpt: str,
    save_folder_name: str = "eval",
    max_items: Optional[int] = None,
    alpha_type: Optional[List[float]] = None,
) -> List[Dict]:
    """dataset items need: caption, boxes (N,4 normalized), masks (N,),
    and optionally category names via 'phrases'."""
    metas = []
    n = min(len(dataset), max_items or len(dataset))
    for i in range(n):
        item = dataset[i]
        live = item["masks"] > 0
        boxes = [list(map(float, b)) for b in item["boxes"][live]]
        phrases = item.get("phrases") or [item["caption"]] * len(boxes)
        metas.append(
            dict(
                ckpt=ckpt,
                prompt=item["caption"],
                phrases=list(phrases)[: len(boxes)],
                locations=boxes,
                alpha_type=alpha_type,
                save_folder_name=save_folder_name,
                eval_id=int(item.get("id", i)),
            )
        )
    return metas


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--image_root", required=True)
    p.add_argument("--instances_json", required=True)
    p.add_argument("--captions_json", default=None)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--max_items", type=int, default=None)
    args = p.parse_args(argv)

    from gligen_tpu.eval.datasets import COCOEvalDataset

    ds = COCOEvalDataset(
        args.image_root, args.instances_json, args.captions_json,
        max_images=args.max_items,
    )
    metas = metas_from_dataset(ds, args.ckpt, max_items=args.max_items)
    with open(args.out, "w") as f:
        json.dump(metas, f, indent=1)
    print(f"wrote {len(metas)} metas -> {args.out}")


if __name__ == "__main__":
    main()
