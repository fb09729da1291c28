"""Worker for tests/test_distributed.py: one real JAX process of two.

Run as: python tests/distributed_worker.py <rank> <coordinator> <tmpdir> [mode]

Exercises the REAL multi-process paths that single-process CI can only
short-circuit (reference analogs: utils.py:78-91 pickled all_gather,
utils.py:37-49 metric sync, utils.py:263-265 rank-0 saves, DDP train step):

  * mesh.init_distributed via JAX_* env discovery
  * collectives.all_gather_objects (pickle + process_allgather)
  * MetricLogger.synchronize_between_processes
  * DetectionLoader shard equal step counts
  * one jitted DP train step over the global mesh (shard_batch's
    make_array_from_process_local_data path), loss identical on both ranks
  * collective orbax checkpoint write (all ranks) + rank-0 args.json +
    restore round-trip

mode "evalcli" instead drives the USER-FACING eval: cli/train.py --test-only
(compute_mean_avg_precision -> CocoEvaluator.synchronize_between_processes,
reference train.py:271-314 + coco_eval.py:158-187) on the shared mini
dataset under <tmpdir>, writing the 12 COCO stats to
<tmpdir>/stats_rank<rank>.npy for the parent to compare with a 1-process run.
"""

import os
import sys


def _eval_cli(rank: int, tmpdir: str):
    """Run cli/train.py --test-only under this 2-process group."""
    import numpy as np

    from snn_automotive_object_detection_tpu.parallel.collectives import (
        all_gather_objects,
    )
    from cli import train as cli_train

    ds_yaml = os.path.join(tmpdir, "mini.yaml")
    model_yaml = os.path.join(tmpdir, "model.yaml")
    args = cli_train.get_args_parser().parse_args(
        ["-d", ds_yaml, "--model-config", model_yaml, "--rpn-snn",
         "--detector-snn", "-t-rpn", "2", "-t-det", "2", "-b", "1",
         "-j", "1", "--fp32", "--test-only"])
    stats = np.asarray(cli_train.main(args))
    assert stats.shape == (12,), stats.shape
    both = all_gather_objects(stats)
    np.testing.assert_array_equal(both[0], both[1],
                                  err_msg="stats differ across ranks")
    np.save(os.path.join(tmpdir, f"stats_rank{rank}.npy"), stats)
    print(f"[rank {rank}] eval CLI OK")
    print(f"[rank {rank}] ALL OK")


def main():
    rank = int(sys.argv[1])
    coordinator = sys.argv[2]
    tmpdir = sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "full"

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_COORDINATOR_ADDRESS"] = coordinator
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = str(rank)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax

    from snn_automotive_object_detection_tpu.parallel.mesh import (
        data_parallel_mesh,
        init_distributed,
        is_main_process,
        replicate,
        shard_batch,
    )

    assert init_distributed(), "env discovery failed"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == rank

    if mode == "evalcli":
        _eval_cli(rank, tmpdir)
        return

    import numpy as np
    import jax.numpy as jnp

    from snn_automotive_object_detection_tpu.parallel.collectives import (
        all_gather_objects,
    )

    # ---- pickled object all-gather (the path single-process CI skips)
    got = all_gather_objects({"rank": rank, "payload": "x" * (10 + 100 * rank)})
    assert [g["rank"] for g in got] == [0, 1], got
    assert len(got[1]["payload"]) == 110
    print(f"[rank {rank}] all_gather_objects OK")

    # ---- metric sync
    from snn_automotive_object_detection_tpu.utils.logging import MetricLogger

    logger = MetricLogger()
    logger.update(loss=float(rank + 1))  # rank0: 1.0, rank1: 2.0
    logger.synchronize_between_processes()
    assert abs(logger.meters["loss"].global_avg - 1.5) < 1e-9, (
        logger.meters["loss"].global_avg
    )
    print(f"[rank {rank}] metric sync OK")

    # ---- loader shard: equal step counts on an odd-sized dataset
    from snn_automotive_object_detection_tpu.data.loader import DetectionLoader

    class FakeDataset:
        def __len__(self):
            return 5

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            img = rng.uniform(0, 255, (64, 128, 3)).astype(np.uint8)
            target = {
                "boxes": np.asarray([[4.0, 4.0, 60.0, 40.0]], np.float32),
                "labels": np.asarray([1], np.int64),
                "image_id": i,
            }
            return img, target

    loader = DetectionLoader(FakeDataset(), batch_size=1, bucket=(64, 128),
                             min_size=64, max_size=128, num_workers=1,
                             shard=(rank, 2))
    n_batches = len(list(loader))
    counts = all_gather_objects(n_batches)
    assert counts[0] == counts[1] == len(loader), counts
    print(f"[rank {rank}] loader shard OK ({n_batches} batches)")

    # ---- one DP train step over the global mesh
    from snn_automotive_object_detection_tpu.models.factory import (
        DetectorConfig,
        init_params,
    )
    from snn_automotive_object_detection_tpu.models.roi_heads import RoIConfig
    from snn_automotive_object_detection_tpu.models.rpn import RPNConfig
    from snn_automotive_object_detection_tpu.train.optim import (
        build_optimizer,
        split_trainable,
    )
    from snn_automotive_object_detection_tpu.train.steps import make_train_step

    config = DetectorConfig(
        num_classes=3, rpn_snn=True, detector_snn=True, t_rpn=1, t_det=1,
        min_size=64, max_size=128,
        rpn=RPNConfig(pre_nms_top_n_train=32, post_nms_top_n_train=16,
                      pre_nms_top_n_test=32, post_nms_top_n_test=16),
        roi=RoIConfig(batch_size_per_image=8, detections_per_img=4),
        compute_dtype=jnp.float32,
    )
    params = init_params(config, jax.random.PRNGKey(0))
    trainable, frozen = split_trainable(params)
    optimizer = build_optimizer("SGD", 1e-3)
    opt_state = optimizer.init(trainable)

    mesh = data_parallel_mesh()  # global: 2 devices across 2 processes
    assert mesh.devices.size == 2

    # process-LOCAL batch: 1 image per process, rank-distinct content
    rng = np.random.default_rng(100 + rank)
    local = {
        "images": rng.uniform(0, 1, (1, 64, 128, 3)).astype(np.float32),
        "image_sizes": np.asarray([[64, 128]], np.int32),
        "original_sizes": np.asarray([[64, 128]], np.int32),
        "targets": {
            "boxes": np.asarray([[[8.0, 8.0, 56.0, 40.0]]], np.float32),
            "labels": np.ones((1, 1), np.int32),
            "valid": np.ones((1, 1), bool),
        },
    }
    with mesh:
        trainable = replicate(trainable, mesh)
        frozen = replicate(frozen, mesh)
        opt_state = replicate(opt_state, mesh)
        batch = shard_batch(local, mesh)
        assert batch["images"].shape[0] == 2  # global batch assembled
        step = make_train_step(config, optimizer)
        trainable, opt_state, losses = step(
            trainable, frozen, opt_state, batch, jax.random.PRNGKey(1)
        )
        losses = {k: float(v) for k, v in losses.items()}
    for k, v in losses.items():
        assert np.isfinite(v), (k, v)
    # globally-averaged loss must be IDENTICAL on both ranks
    both = all_gather_objects(losses["loss_total"])
    assert abs(both[0] - both[1]) < 1e-6, both
    print(f"[rank {rank}] DP train step OK (loss_total={losses['loss_total']:.4f})")

    # ---- collective checkpoint write (orbax syncs internally; args.json is
    # written by rank 0 only) + restore round-trip on both ranks
    from snn_automotive_object_detection_tpu.utils.checkpoint import (
        load_checkpoint,
        load_checkpoint_args,
        save_checkpoint,
    )

    ckpt = os.path.join(tmpdir, "ckpt")
    save_checkpoint(ckpt, {"epoch": 3}, args={"lr": 0.1})
    assert is_main_process() == (rank == 0)
    all_gather_objects("barrier")  # writes visible before cross-rank checks
    assert os.path.isdir(ckpt), "checkpoint missing"
    assert load_checkpoint_args(ckpt)["lr"] == 0.1
    assert int(load_checkpoint(ckpt)["epoch"]) == 3
    print(f"[rank {rank}] collective checkpoint OK")

    print(f"[rank {rank}] ALL OK")


if __name__ == "__main__":
    main()
