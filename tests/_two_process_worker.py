"""Worker for the 2-process jax.distributed test (test_two_process.py).

Run as: python _two_process_worker.py <rank> <port> <out_dir>

Exercises, with a REAL process_count==2 (round-3 verdict: these paths had
only ever executed single-process):
  * parallel/comm.all_gather of ragged per-host python objects (the eval
    prediction-merge transport; reference utils/comm.py:61-102)
  * parallel/comm.reduce_dict
  * DetectionEvaluator host-sharded accumulation + state merge ==
    single-process evaluation (reference engine/inference.py:293-312)
  * QueryBank.allgather_merge — the rank-merged bank the reference never
    implemented (tools/train_net.py:305-336 saves per-rank files)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    rank, port, out_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    # the axon TPU-tunnel plugin force-sets jax_platforms at boot
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=rank,
    )
    assert jax.process_count() == 2
    assert jax.process_index() == rank

    import numpy as np

    from mqdet_tpu.engine.evaluator import DetectionEvaluator
    from mqdet_tpu.mq.bank import QueryBank
    from mqdet_tpu.parallel import comm

    # ---- all_gather of ragged python objects ------------------------------
    mine = {
        "rank": rank,
        "preds": {i: np.full((i + 1, 4), rank, np.float32) for i in range(rank + 1)},
        "text": "r" * (rank + 3),
    }
    gathered = comm.all_gather(mine)
    assert len(gathered) == 2
    for r, g in enumerate(gathered):
        assert g["rank"] == r and g["text"] == "r" * (r + 3)
        assert sorted(g["preds"]) == list(range(r + 1))
        for i, arr in g["preds"].items():
            np.testing.assert_array_equal(arr, np.full((i + 1, 4), r))

    # ---- reduce_dict -------------------------------------------------------
    red = comm.reduce_dict({"loss": 1.0 + rank, "aux": 10.0 * (rank + 1)})
    assert abs(red["loss"] - 1.5) < 1e-6, red
    assert abs(red["aux"] - 15.0) < 1e-6, red

    # ---- host-sharded evaluator == single-process -------------------------
    rng = np.random.default_rng(0)  # SAME stream on both ranks
    n_images, n_cats = 12, 5
    problems = []
    for img in range(n_images):
        n_gt = int(rng.integers(1, 4))
        gt_boxes = rng.uniform(0, 80, (n_gt, 2))
        gt_boxes = np.concatenate([gt_boxes, gt_boxes + rng.uniform(8, 30, (n_gt, 2))], 1)
        gt_labels = rng.integers(1, n_cats + 1, n_gt)
        n_det = int(rng.integers(0, 6))
        det_boxes = rng.uniform(0, 80, (n_det, 2))
        det_boxes = np.concatenate([det_boxes, det_boxes + rng.uniform(8, 30, (n_det, 2))], 1)
        det_scores = rng.uniform(0.1, 1.0, n_det).astype(np.float32)
        det_labels = rng.integers(1, n_cats + 1, n_det)
        # overlap some detections with gt so TPs exist
        if n_det and n_gt:
            det_boxes[0] = gt_boxes[0] + 1.0
            det_labels[0] = gt_labels[0]
        problems.append((img, gt_boxes, gt_labels, det_boxes, det_scores, det_labels))

    def feed(ev, imgs):
        for img, gb, gl, db, ds, dl in imgs:
            ev.add_image(img, gb, gl, db, ds, dl, neg_category_ids=[n_cats])

    oracle = DetectionEvaluator(style="coco")
    oracle.register_categories(range(1, n_cats + 1))
    feed(oracle, problems)
    want = oracle.summarize()

    sharded = DetectionEvaluator(style="coco")
    sharded.register_categories(range(1, n_cats + 1))
    feed(sharded, problems[rank::2])  # same strided shard run_inference uses
    for r, st in enumerate(comm.all_gather(sharded.state_dict())):
        if r != rank:
            sharded.merge_state(st)
    got = sharded.summarize()
    want = {
        k: float(v) for k, v in want.items() if isinstance(v, (int, float))
    }
    for k in want:
        assert abs(float(got[k]) - want[k]) < 1e-9, (k, got[k], want[k])

    # ---- rank-merged query bank -------------------------------------------
    bank = QueryBank(channels=8)
    # overlapping label 1, disjoint labels 2/3
    bank.add(1, np.full((2, 1, 8), rank, np.float32))
    bank.add(2 + rank, np.full((1, 1, 8), 10 + rank, np.float32))
    bank.allgather_merge()
    assert bank.labels == [1, 2, 3], bank.labels
    assert bank.count(1) == 4
    np.testing.assert_array_equal(
        np.sort(bank.get(1)[:, 0, 0]), [0, 0, 1, 1]
    )
    assert bank.get(2)[0, 0, 0] == 10 and bank.get(3)[0, 0, 0] == 11

    comm.synchronize()
    with open(os.path.join(out_dir, f"ok_{rank}.json"), "w") as f:
        json.dump({"rank": rank, "ok": True, "ap": want}, f)
    print(f"rank {rank} OK")


if __name__ == "__main__":
    main()
