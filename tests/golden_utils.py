"""Golden-image test harness replicating the reference procedure
(integration_tests.rs:305-350): render, save actual, blur-downsample both to
100x50, RMS-similarity score must exceed 0.95."""
import os

import numpy as np
from PIL import Image

from solstrale_tpu import Renderer
from solstrale_tpu.utils import compare_images_rms

THRESHOLD = 0.95
EXPECTED_DIR = "/root/reference/tests/output"
ACTUAL_DIR = os.path.join(os.path.dirname(__file__), "output")


def render_and_compare(scene, name, expected_name=None, threshold=THRESHOLD):
    image = Renderer(scene).render_final()
    compare_output(image, name, expected_name, threshold)
    return image


def compare_output(actual_u8, name, expected_name=None, threshold=THRESHOLD):
    os.makedirs(ACTUAL_DIR, exist_ok=True)
    Image.fromarray(np.asarray(actual_u8)).save(
        os.path.join(ACTUAL_DIR, f"out_actual_{name}.jpg"))
    expected_path = os.path.join(
        EXPECTED_DIR, f"out_expected_{expected_name or name}.jpg")
    expected = np.asarray(Image.open(expected_path).convert("RGB"))
    score = compare_images_rms(np.asarray(actual_u8), expected)
    assert score > threshold, f"Comparison score for {name} is: {score}"
