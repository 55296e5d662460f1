"""TSV dataset reader: lineidx, random access, composite shards, OD view."""
import base64
import io
import json
import os

import numpy as np

from mqdet_tpu.data.tsv import CompositeTSVFile, ODTSVDataset, TSVFile


def _write_shard(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write("\t".join(r) + "\n")


def _b64_image(w=8, h=6):
    from PIL import Image

    img = Image.fromarray(np.full((h, w, 3), 127, np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def test_tsv_random_access(tmp_path):
    p = str(tmp_path / "a.tsv")
    _write_shard(p, [[f"k{i}", json.dumps([]), "x" * i] for i in range(5)])
    t = TSVFile(p)
    assert len(t) == 5
    assert t.get_key(3) == "k3"
    assert t.seek(4)[2] == "xxxx"
    assert os.path.isfile(str(tmp_path / "a.lineidx"))


def test_composite(tmp_path):
    for name, keys in [("s0.tsv", ["a", "b"]), ("s1.tsv", ["c"])]:
        _write_shard(str(tmp_path / name), [[k, "[]", ""] for k in keys])
    comp = CompositeTSVFile(["s0.tsv", "s1.tsv"], [(1, 0), (0, 1)], root=str(tmp_path))
    assert comp.get_key(0) == "c"
    assert comp.get_key(1) == "b"
    assert len(comp) == 2


def test_od_view(tmp_path):
    p = str(tmp_path / "od.tsv")
    labels = [{"rect": [1, 2, 5, 6], "class": "cat"},
              {"rect": [0, 0, 3, 3], "class": "dog"}]
    _write_shard(p, [["img0", json.dumps(labels), _b64_image()]])
    ds = ODTSVDataset(p)
    img, boxes, names = ds[0]
    assert img.shape == (6, 8, 3)
    assert boxes == [[1, 2, 5, 6], [0, 0, 3, 3]]
    assert names == ["cat", "dog"]


def test_chunk_by_node_sampler():
    from mqdet_tpu.data.samplers import distributed_shard_chunk_by_node

    sizes = [10, 6, 6, 6, 6]          # 1 normal + 4 chunked
    chunk = [False, True, True, True, True]
    world, nodes, ppn = 4, 2, 2
    seen_by_node = {0: set(), 1: set()}
    all_seen = set()
    for rank in range(world):
        node = rank // ppn
        idx = distributed_shard_chunk_by_node(
            sizes, chunk, rank=rank, world_size=world, node_rank=node,
            node_number=nodes, rank_within_node=rank % ppn,
            process_num_per_node=ppn,
        )
        seen_by_node[node].update(i for i in idx if i >= 10)
        all_seen.update(idx)
    # node 0 only sees chunked datasets 1-2 (indices 10..21), node 1 sees 3-4
    assert seen_by_node[0] <= set(range(10, 22))
    assert seen_by_node[1] <= set(range(22, 34))
    # full coverage of the dataset across ranks
    assert all_seen == set(range(34))
