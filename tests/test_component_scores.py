"""Component splitting + winning-score-map scoring equal the host
detect_instance path (the reduction make_ins_seg_labels actually runs:
only the label map and the per-pixel winning score cross device->host,
stages_irn.py)."""

import numpy as np

from irn_tpu.ops import centroids as cm


def test_split_components_and_scores_match_host(rng):
    h = w = 40
    n_rows = 6
    # synthetic decoded label map: a few blobs per row id
    labels = np.zeros((h, w), np.int32)
    labels[2:10, 2:10] = 1
    labels[2:8, 20:30] = 1        # second component of row 0
    labels[15:25, 5:15] = 3
    labels[30:38, 25:38] = 6
    rw_up = rng.random((n_rows, h, w)).astype(np.float32)

    comp_map, comp_rows, comp_sizes = cm.split_components(labels, n_rows)
    assert comp_rows.tolist() == [0, 0, 2, 5]
    assert comp_sizes.tolist() == [64, 60, 100, 8 * 13]

    # the stage's scoring reduction: at any pixel a component owns, its
    # row is the per-pixel argmax, so the winning-score map carries every
    # per-component max (stages_irn.py make_ins_seg_labels)
    best = np.take_along_axis(
        rw_up, (labels - 1).clip(0, n_rows - 1)[None], axis=0
    )[0]
    k_comps = comp_rows.shape[0]
    scores = np.zeros(k_comps + 1, np.float32)
    np.maximum.at(scores, comp_map.reshape(-1), best.reshape(-1))

    # host oracle: detect_instance over the per-row one-hot masks
    from irn_tpu.ops import cc

    instance_shape = cc.to_one_hot(labels, maximum_val=n_rows + 1)[1:]
    class_ids = np.arange(n_rows)
    det = cm.detect_instance(rw_up, instance_shape, class_ids,
                             max_fragment_size=0)
    np.testing.assert_allclose(scores[1 : k_comps + 1], det["score"],
                               rtol=1e-6)
    # masks identical
    for k in range(k_comps):
        np.testing.assert_array_equal(comp_map == k + 1, det["mask"][k])
