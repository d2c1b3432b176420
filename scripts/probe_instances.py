"""Calibration probe for the multi-INSTANCE head (watershed split of the
per-class CAM mask).

Sweeps, on same-class AND distinct-class composite scenes (calibration
seed 77; held-out evaluation uses seed 123 via apps.eval_detection):

  * splitter: plain connected components vs marker-based watershed
    (cores at CAM_CORE_PERCENTILE grown through the percentile-70 mask)
  * CAM_CORE_PERCENTILE (the marker threshold)
  * INSTANCE_MIN_PIXELS (absolute noise floor)
  * INSTANCE_MIN_FRAC (relative floor: instance count >= frac * largest
    instance of that class — suppresses over-splitting of single objects
    without capping genuine same-size pairs)

Metric = apps.eval_detection.evaluate_instances: greedy per-class box
matching, recall at IoU floors, false boxes per frame. Run on CPU (host
twins; the device path is bit-parity-tested against them).

Results 2026-08-19 (lyr3-std shipped bundle, 40 scenes/config). Shipped
constants: core_pct=88, min_pixels=6, min_frac=0.25, and the ">=2
surviving instances else union box" emission policy (policy B — policy A
always emitted surviving instances and lost 0.11 recall@0.1 on
distinct-class scenes by replacing good union boxes with fragments).
Calibration seed 77, instances=3:

  plain CC (no watershed):    same r@0.1 0.463 r@0.3 0.338 fp 1.77
  watershed pct=88 + floors:  same r@0.1 0.600 r@0.3 0.450 fp 1.95
                              dist r@0.1 0.600 r@0.3 0.225 fp 1.82
  baseline instances=1:       same r@0.1 0.475 r@0.3 0.350 fp 1.30
                              dist r@0.1 0.650 r@0.3 0.237 fp 0.78

Held-out seed 123 (apps.eval_detection --multi --instances 3):
  same-class: r@0.1 0.500 -> 0.650, r@0.3 0.275 -> 0.350, fp 1.20 -> 2.17
  distinct:   r@0.1 0.662 -> 0.637, r@0.3 0.225 -> 0.275, fp 0.88 -> 2.17
A min-core-pixel filter (>=2 core px per instance) was probed and NOT
shipped: it trades recall for fp along the same frontier min_frac
already covers (same r@0.1 0.588 -> 0.475 from min_core 1 -> 4).
"""
import sys

sys.path.insert(0, "/root/repo")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from tpu_cnn.apps.common import load_model
    from tpu_cnn.apps.eval_detection import evaluate_instances
    from tpu_cnn.ops import detect_head
    from tpu_cnn.utils.paths import default_artifacts

    model = load_model(default_artifacts(), "lyr3-std")
    thr = model.multi_thresh if model.multi_thresh is not None else 0.15

    def run(tag, **kw):
        out = {}
        for same in (True, False):
            r = evaluate_instances(model, mode="xla", n_scenes=40, seed=77,
                                   thresh=thr, same_class=same,
                                   verbose=False, **kw)
            out["same" if same else "dist"] = r
            kind = "same" if same else "dist"
            print(f"  {tag} [{kind}]: r@0.1={r['recall@0.1']:.3f} "
                  f"r@0.3={r['recall@0.3']:.3f} iou={r['matched_iou']:.3f} "
                  f"fp={r['false_boxes_per_frame']:.2f}")
        return out

    print("baseline (instances=1, per-class box):")
    run("inst=1", instances=1)

    print("watershed splitter, core_pct sweep (instances=3, min_px=6):")
    for pct in (82.0, 85.0, 88.0, 92.0):
        detect_head.CAM_CORE_PERCENTILE = pct
        run(f"pct={pct}", instances=3)
    detect_head.CAM_CORE_PERCENTILE = 88.0

    print("min_frac sweep (instances=3, pct=88, min_px=6):")
    for frac in (0.0, 0.15, 0.25, 0.4, 0.6):
        run(f"frac={frac}", instances=3, min_frac=frac)


if __name__ == "__main__":
    main()
