"""Pixel kernels vs hand-computed arrays (SURVEY.md §5 layer 1 — these
tests ARE the spec for the numpy morphology, since cv2 is absent)."""

import numpy as np

from pdf_parser_spark.kernels.pixel import (
    component_bboxes,
    connected_components,
    dilate_rect,
    erode_rect,
    otsu_threshold,
    threshold_binary_otsu,
)


def test_otsu_bimodal():
    img = np.array([[10] * 50 + [200] * 50], dtype=np.uint8)
    t = otsu_threshold(img)
    assert 10 <= t < 200
    b = threshold_binary_otsu(img)
    assert set(b[0, :50]) == {0} and set(b[0, 50:]) == {255}


def test_otsu_uniform():
    img = np.full((4, 4), 77, dtype=np.uint8)
    b = threshold_binary_otsu(img)
    # threshold t: only value 77; argmax of all-invalid sigma -> t=0;
    # pixels > 0 -> 255 (pinned spec)
    assert (b == 255).all()


def test_erode_removes_short_runs():
    img = np.zeros((1, 20), dtype=np.uint8)
    img[0, 2:6] = 255  # run of 4
    img[0, 10:17] = 255  # run of 7
    out = erode_rect(img, 5, 1, 1)
    assert (out[0, 2:6] == 0).all()  # 4 < 5 gone
    assert out[0, 13] == 255  # run of 7 survives at its center
    assert out[0, 12] == 255 and out[0, 14] == 255  # 7-5+1=3 survivors


def test_erode_dilate_restores_long_line():
    img = np.zeros((5, 200), dtype=np.uint8)
    img[2, 20:180] = 255
    line = dilate_rect(erode_rect(img, 9, 1, 3), 9, 1, 3)
    # effective window 3*8+1=25 (odd): symmetric shrink+regrow restores
    assert (line[2, 20:180] == 255).all()
    assert line[2, 19] == 0 and line[2, 180] == 0
    assert (line[[0, 1, 3, 4]] == 0).all()


def test_erode_iterations_equal_composition():
    rng = np.random.Generator(np.random.PCG64(7))
    img = (rng.random((30, 40)) < 0.5).astype(np.uint8) * 255
    # odd kernels have symmetric anchors -> iterated == collapsed exactly.
    # (For even kernels the two differ by a fixed sub-pixel shift; the
    # engine always uses the collapsed form, which is the pinned spec.)
    a = erode_rect(erode_rect(erode_rect(img, 5, 1, 1), 5, 1, 1), 5, 1, 1)
    b = erode_rect(img, 5, 1, 3)
    assert (a == b).all()


def test_connected_components_basic():
    img = np.array(
        [
            [1, 1, 0, 0, 1],
            [0, 1, 0, 1, 1],
            [0, 0, 0, 0, 0],
            [1, 0, 0, 0, 1],
        ],
        dtype=np.uint8,
    )
    labels, n = connected_components(img)
    assert n == 4
    # first-encounter row-major label order
    assert labels[0, 0] == 1 and labels[0, 4] == 2
    assert labels[1, 1] == 1 and labels[1, 3] == 2
    assert labels[3, 0] == 3 and labels[3, 4] == 4
    boxes = component_bboxes(labels, n)
    assert boxes[0] == (0, 0, 2, 2)
    assert boxes[1] == (3, 0, 2, 2)
    assert boxes[2] == (0, 3, 1, 1)
    assert boxes[3] == (4, 3, 1, 1)


def test_connected_components_u_shape_merge():
    # U shape: two arms that merge at the bottom must be ONE component
    img = np.zeros((5, 5), dtype=np.uint8)
    img[0:4, 0] = 1
    img[0:4, 4] = 1
    img[4, :] = 1
    labels, n = connected_components(img)
    assert n == 1
    assert component_bboxes(labels, n)[0] == (0, 0, 5, 5)


def test_connected_components_diagonal_not_connected():
    img = np.eye(3, dtype=np.uint8)
    _, n = connected_components(img)
    assert n == 3  # 4-connectivity


def test_open_rect_binary_equals_erode_then_dilate():
    """The bool-domain opening must be byte-identical to the uint8
    erode->dilate chain on binary images (it replaced that chain in the
    ruling-line hot path)."""
    import numpy as np

    from pdf_parser_spark.kernels.pixel import (
        dilate_rect,
        erode_rect,
        open_rect_binary,
    )

    rng = np.random.Generator(np.random.PCG64(17))
    for h, w, kw, kh, it in [
        (60, 80, 8, 1, 3),
        (60, 80, 1, 8, 3),
        (37, 53, 5, 5, 2),
        (10, 10, 2, 2, 1),
        (5, 200, 41, 1, 3),
    ]:
        img = (rng.integers(0, 2, (h, w), dtype=np.uint8)) * 255
        ref = dilate_rect(erode_rect(img, kw, kh, it), kw, kh, it)
        got = open_rect_binary(img, kw, kh, it)
        assert np.array_equal(got, ref), (h, w, kw, kh, it)
