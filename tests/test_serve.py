"""Serving-layer tests: route contracts (JSON schemas of the reference
app, main.py:710-910), multipart parsing, job manager state machine,
clinical report generator."""

import json
import time

import numpy as np
import pytest

from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.serve import (
    BrainTumorApp, TrainingJobManager, calculate_medical_metrics,
    generate_clinical_report)
from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.serve.app import (
    parse_multipart, secure_filename)


@pytest.fixture(scope="module")
def app(tmp_path_factory):
    import dataclasses
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.config import Config
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.inference import Predictor
    cfg = Config()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, features=(8, 16),
                                  in_channels=1,
                                  compute_dtype="float32", remat=False),
        data=dataclasses.replace(cfg.data, image_size=(16, 16, 16)),
        inference=dataclasses.replace(cfg.inference,
                                      roi_size=(16, 16, 16)),
        data_dir=str(tmp_path_factory.mktemp("dataroot")))
    up = str(tmp_path_factory.mktemp("uploads"))
    return BrainTumorApp(cfg, upload_dir=up,
                         predictor=Predictor(cfg))


def _get(app, path, query=None):
    return app.route("GET", path, query or {}, b"", {})


def _post_json(app, path, obj):
    return app.route("POST", path, {}, json.dumps(obj).encode(),
                     {"content-type": "application/json"})


def test_pages_render(app):
    for path in ("/", "/metrics", "/documentation"):
        status, ctype, payload = _get(app, path)
        assert status == 200 and ctype == "text/html"
        assert "<html" in payload
    status, _, payload = _get(app, "/health")
    assert status == 200 and json.loads(payload)["status"] == "ok"


def test_404(app):
    status, _, payload = _get(app, "/nope")
    assert status == 404 and not json.loads(payload)["success"]


def test_multipart_parser():
    boundary = "XBOUND"
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="demo"\r\n\r\n'
        "1\r\n"
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="file"; '
        'filename="scan.nii"\r\n'
        "Content-Type: application/octet-stream\r\n\r\n"
    ).encode() + b"BINARY\x00DATA" + f"\r\n--{boundary}--\r\n".encode()
    fields = parse_multipart(
        body, f'multipart/form-data; boundary={boundary}')
    assert fields["demo"]["data"] == b"1"
    assert fields["file"]["filename"] == "scan.nii"
    assert fields["file"]["data"] == b"BINARY\x00DATA"


def test_multipart_preserves_trailing_crlf_bytes():
    """Only the single delimiter CRLF may be removed: gzip/NIfTI
    payloads legitimately end in 0x0A/0x0D bytes."""
    boundary = "XBOUND"
    payload = b"ABC\n\r\n\r\n"          # real data ends with \n\r\n\r\n
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="file"; '
        'filename="x.nii.gz"\r\n\r\n'
    ).encode() + payload + f"\r\n--{boundary}--\r\n".encode()
    fields = parse_multipart(
        body, f'multipart/form-data; boundary={boundary}')
    assert fields["file"]["data"] == payload


def test_secure_filename():
    assert secure_filename("../../etc/passwd") == "passwd"
    assert secure_filename("my scan (1).nii.gz") == "my_scan__1_.nii.gz"
    assert secure_filename("") == "upload"


def test_upload_demo_contract(app):
    """Demo-mode upload returns the full reference JSON schema
    (main.py:859-895)."""
    boundary = "B123"
    body = (f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="demo"\r\n\r\n'
            "1\r\n"
            f"--{boundary}--\r\n").encode()
    status, _, payload = app.route(
        "POST", "/upload", {}, body,
        {"content-type": f"multipart/form-data; boundary={boundary}"})
    j = json.loads(payload)
    assert status == 200 and j["success"]
    assert set(j) >= {"patient_info", "classification", "measurements",
                      "quality_metrics", "clinical_notes",
                      "visualizations"}
    assert j["patient_info"]["study_id"].startswith("STU_")
    assert "primary_diagnosis" in j["classification"]
    assert j["visualizations"]["multiplanar"].startswith(
        "data:image/png;base64,")
    assert j["degraded_mode"] is True
    assert j["quality_metrics"]["estimated"] is True


@pytest.mark.slow
def test_upload_real_inference(app, tmp_path, rng):
    """A real .npy upload goes through actual model inference."""
    vol = rng.normal(0.5, 0.2, (16, 16, 16)).astype(np.float32)
    import io as _io
    buf = _io.BytesIO()
    np.save(buf, vol)
    boundary = "B9"
    body = (f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="file"; '
            'filename="t.npy"\r\n\r\n').encode() + buf.getvalue() + (
        f"\r\n--{boundary}--\r\n").encode()
    status, _, payload = app.route(
        "POST", "/upload", {}, body,
        {"content-type": f"multipart/form-data; boundary={boundary}"})
    j = json.loads(payload)
    assert j["success"]
    assert j["degraded_mode"] is False
    assert j["patient_info"]["filename"] == "t.npy"


@pytest.mark.slow
def test_upload_with_tta_config(tmp_path_factory, rng):
    """InferenceConfig.tta gates mirror TTA on the upload path."""
    import dataclasses
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.config import Config
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.inference import Predictor
    cfg = Config()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, features=(8, 16),
                                  in_channels=1,
                                  compute_dtype="float32", remat=False),
        data=dataclasses.replace(cfg.data, image_size=(16, 16, 16)),
        inference=dataclasses.replace(cfg.inference,
                                      roi_size=(16, 16, 16),
                                      upload_mode="whole_volume",
                                      tta=True),
        data_dir=str(tmp_path_factory.mktemp("dataroot_tta")))
    tta_app = BrainTumorApp(
        cfg, upload_dir=str(tmp_path_factory.mktemp("uploads_tta")),
        predictor=Predictor(cfg))
    vol = rng.normal(0.5, 0.2, (16, 16, 16)).astype(np.float32)
    import io as _io
    buf = _io.BytesIO()
    np.save(buf, vol)
    boundary = "B11"
    body = (f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="file"; '
            'filename="tta.npy"\r\n\r\n').encode() + buf.getvalue() + (
        f"\r\n--{boundary}--\r\n").encode()
    status, _, payload = tta_app.route(
        "POST", "/upload", {}, body,
        {"content-type": f"multipart/form-data; boundary={boundary}"})
    j = json.loads(payload)
    assert j["success"] and j["degraded_mode"] is False


@pytest.mark.slow
def test_upload_native_resolution_sliding_window(app, rng):
    """Uploads keep NATIVE resolution: a volume larger than the model
    size goes through the foreground-cropped Gaussian sliding-window
    path (VERDICT round-1 item 6: the reference zooms destructively,
    main.py:382). Noise volumes have no constant background, so the
    crop degrades to the full extent — still native res."""
    assert app.config.inference.upload_mode in ("cropped",
                                                "sliding_window")
    vol = rng.normal(0.5, 0.2, (24, 18, 20)).astype(np.float32)
    import io as _io
    buf = _io.BytesIO()
    np.save(buf, vol)
    boundary = "B10"
    body = (f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="file"; '
            'filename="native.npy"\r\n\r\n').encode() + buf.getvalue() + (
        f"\r\n--{boundary}--\r\n").encode()
    status, _, payload = app.route(
        "POST", "/upload", {}, body,
        {"content-type": f"multipart/form-data; boundary={boundary}"})
    j = json.loads(payload)
    assert j["success"] and j["degraded_mode"] is False


def test_preprocess_image_native_resolution(tmp_path, rng):
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.inference.predictor import (
        preprocess_image)
    vol = rng.normal(size=(20, 22, 24)).astype(np.float32)
    native = preprocess_image(vol, None)
    assert native.shape == (20, 22, 24)
    resized = preprocess_image(vol, (16, 16, 16))
    assert resized.shape == (16, 16, 16)


def test_training_jobs_demo_lifecycle():
    mgr = TrainingJobManager()
    sid = mgr.start_training_session(
        {"mode": "demo", "epochs": 3, "epoch_seconds": 0.05})
    for _ in range(100):
        p = mgr.get_training_progress(sid)
        if p["status"] == "completed":
            break
        time.sleep(0.05)
    p = mgr.get_training_progress(sid)
    assert p["status"] == "completed"
    assert p["current_epoch"] == 3
    assert 0 < p["dice_score"] <= 0.95
    assert p["logs"]


def test_training_jobs_stop():
    mgr = TrainingJobManager()
    sid = mgr.start_training_session(
        {"mode": "demo", "epochs": 50, "epoch_seconds": 0.1})
    time.sleep(0.3)
    assert mgr.stop_training_session(sid)
    for _ in range(50):
        p = mgr.get_training_progress(sid)
        if p["status"] in ("stopped", "completed"):
            break
        time.sleep(0.1)
    assert p["status"] == "stopped"
    assert not mgr.stop_training_session("bogus_id")


@pytest.mark.slow
def test_start_training_route_real_mode(app):
    """Real-mode web training end-to-end on a tiny config."""
    status, _, payload = _post_json(app, "/start_training", {
        "mode": "real", "epochs": 1, "batch_size": 1, "num_samples": 2,
        "image_size": [16, 16, 16], "model_arch": "tiny",
        "save_checkpoint": False,   # persistence covered by
        # test_web_training_saves_checkpoint_serving_adopts
    })
    j = json.loads(payload)
    assert j["success"] and j["session_id"]
    sid = j["session_id"]
    deadline = time.time() + 300
    while time.time() < deadline:
        _, _, p = _get(app, "/training_progress",
                       {"session_id": [sid]})
        prog = json.loads(p)
        if prog["status"] in ("completed", "error"):
            break
        time.sleep(1.0)
    assert prog["status"] == "completed", prog
    assert prog["current_epoch"] == 1


def test_generate_synthetic_route(app):
    status, _, payload = _post_json(app, "/generate_synthetic_data", {
        "num_samples": 2, "save_dir": "gen",
        "shape": [16, 16, 16],
    })
    j = json.loads(payload)
    assert j["success"] and j["num_samples"] == 2
    import os
    assert os.path.isdir(os.path.join(app.config.data_dir, "gen",
                                      "train"))


def test_generate_synthetic_rejects_path_escape(app, tmp_path):
    """save_dir/data_dir from unauthenticated JSON must stay under the
    configured data root (directory-traversal guard)."""
    import os
    status, _, payload = _post_json(app, "/generate_synthetic_data", {
        "num_samples": 1, "save_dir": str(tmp_path / "outside"),
    })
    assert status == 400 and not json.loads(payload)["success"]
    assert not os.path.exists(str(tmp_path / "outside"))
    status, _, payload = _post_json(app, "/generate_synthetic_data", {
        "num_samples": 1, "save_dir": "../escape",
    })
    assert status == 400
    status, _, payload = _post_json(app, "/start_training", {
        "mode": "demo", "epochs": 1, "data_dir": "/etc",
    })
    assert status == 400 and not json.loads(payload)["success"]


def test_medical_metrics_real_vs_estimated(rng):
    seg = np.zeros((24, 24, 24), np.int8)
    seg[8:16, 8:16, 8:16] = 2
    vol = rng.normal(size=seg.shape).astype(np.float32)
    m1 = calculate_medical_metrics(vol, seg, ground_truth=seg)
    assert m1["dice_score"] == pytest.approx(1.0, abs=1e-5)
    assert not m1["quality_estimated"]
    assert m1["tumor_volume_mm3"] == 512.0
    m2 = calculate_medical_metrics(vol, seg)
    assert m2["quality_estimated"]


def test_clinical_report_ladder():
    for vol_mm3, frag in [(20000, "Glioblastoma"), (10000, "Anaplastic"),
                          (5000, "Diffuse"), (100, "Benign")]:
        r = generate_clinical_report({"tumor_volume_mm3": vol_mm3,
                                      "dice_score": 0.9,
                                      "jaccard_index": 0.8,
                                      "sensitivity": 0.9,
                                      "specificity": 0.95,
                                      "hausdorff_distance": 3.0})
        assert frag in r["classification"]["primary_diagnosis"]
        assert r["clinical_notes"]["findings"]
        assert r["clinical_notes"]["recommendations"]
    # deterministic
    r1 = generate_clinical_report({"tumor_volume_mm3": 9000})
    r2 = generate_clinical_report({"tumor_volume_mm3": 9000})
    assert r1 == r2


def test_clinical_report_model_grade_overrides_volume_ladder():
    """A trained joint grade head's prediction overrides the
    volume-threshold diagnosis; the report declares its source."""
    base = {"tumor_volume_mm3": 100}   # volume ladder would say Benign
    r = generate_clinical_report(base, model_grade=3,
                                 grade_confidence=0.91)
    c = r["classification"]
    assert "Glioblastoma" in c["primary_diagnosis"]
    assert c["grade"] == 3 and c["grade_source"] == "model"
    assert c["confidence"] == pytest.approx(0.91)
    r2 = generate_clinical_report(base)
    assert r2["classification"]["grade_source"] == "volume"
    assert "Benign" in r2["classification"]["primary_diagnosis"]


def test_upload_corrupt_file_degrades(app):
    """A garbage payload falls back to the explicit demo analysis
    (reference degradation contract, main.py:897-905)."""
    boundary = "BX"
    body = (f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="file"; '
            'filename="broken.nii.gz"\r\n\r\n').encode() + b"\x1f\x8b" + (
        b"\x00" * 64) + f"\r\n--{boundary}--\r\n".encode()
    status, _, payload = app.route(
        "POST", "/upload", {}, body,
        {"content-type": f"multipart/form-data; boundary={boundary}"})
    j = json.loads(payload)
    assert j["success"] is True
    assert j["degraded_mode"] is True


@pytest.mark.slow
def test_serve_auto_loads_best_checkpoint(tmp_path):
    """Serving adopts the newest structurally compatible ``best_*``
    checkpoint under models_dir (web/CLI training feeds straight into
    serving); incompatible checkpoints are skipped and /health reports
    the weights source."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.config import Config
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.models import UNet3D
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.train import (
        checkpoints, create_train_state)

    cfg = Config()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, features=(8, 16),
                                  in_channels=1,
                                  compute_dtype="float32", remat=False),
        data=dataclasses.replace(cfg.data, image_size=(16, 16, 16)),
        inference=dataclasses.replace(cfg.inference,
                                      roi_size=(16, 16, 16)),
        models_dir=str(tmp_path / "models"))

    # a compatible trained state (same tiny model) saved as best_*
    model = UNet3D(out_channels=4, features=(8, 16),
                   dtype=jnp.float32, remat=False)
    state = create_train_state(model, cfg, jax.random.PRNGKey(7),
                               (1, 16, 16, 16, 1), steps_per_epoch=2)
    good = str(tmp_path / "models" / "best_exp")
    checkpoints.save_checkpoint(good, state, best_dice=0.9, epoch=3)

    # an incompatible checkpoint that is NEWER (different features)
    other = UNet3D(out_channels=4, features=(16, 32),
                   dtype=jnp.float32, remat=False)
    ostate = create_train_state(other, cfg, jax.random.PRNGKey(8),
                                (1, 16, 16, 16, 1), steps_per_epoch=2)
    bad = str(tmp_path / "models" / "best_other_config")
    checkpoints.save_checkpoint(bad, ostate)
    import os
    os.utime(bad)   # newest mtime -> tried first, must be skipped

    a = BrainTumorApp(cfg, upload_dir=str(tmp_path / "up"))
    pred = a._get_predictor()
    assert a.weights_source == good
    # adopted params match the saved ones
    saved = jax.tree_util.tree_leaves(state.params)
    live = jax.tree_util.tree_leaves(pred.seg_variables["params"])
    assert all(np.allclose(np.asarray(s), np.asarray(l))
               for s, l in zip(saved, live))
    status, _, payload = a.route("GET", "/health", {}, b"", {})
    assert json.loads(payload)["weights"] == good

    # checkpoint="none" keeps the reference's random-init behavior
    cfg2 = cfg.replace(inference=dataclasses.replace(
        cfg.inference, checkpoint="none"))
    a2 = BrainTumorApp(cfg2, upload_dir=str(tmp_path / "up2"))
    a2._get_predictor()
    assert a2.weights_source == "random_init"


@pytest.mark.slow
def test_web_training_saves_checkpoint_serving_adopts(tmp_path,
                                                      monkeypatch):
    """The full web-train -> serve handoff: a real-mode web session with
    the joint (seg+grade) arch persists a best checkpoint under
    models_dir, and a serving app whose model matches the trunk adopts
    the checkpoint's nested "unet" subtree."""
    import dataclasses
    import os
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.config import Config

    monkeypatch.chdir(tmp_path)   # jobs write to ./results/models
    mgr = TrainingJobManager()
    sid = mgr.start_training_session({
        "mode": "real", "epochs": 1, "batch_size": 1, "num_samples": 2,
        "image_size": [16, 16, 16], "model_arch": "joint",
    })
    deadline = time.time() + 420
    prog = None
    while time.time() < deadline:
        prog = mgr.get_training_progress(sid)
        if prog["status"] in ("completed", "error"):
            break
        time.sleep(1.0)
    assert prog["status"] == "completed", prog
    path = prog.get("checkpoint")
    assert path and os.path.isdir(path), prog

    # serving with a matching trunk config adopts the "unet" subtree
    cfg = Config()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model,
                                  features=(16, 32, 64, 128),
                                  remat=False),
        data=dataclasses.replace(cfg.data, image_size=(16, 16, 16)),
        inference=dataclasses.replace(cfg.inference,
                                      roi_size=(16, 16, 16),
                                      checkpoint=path))
    a = BrainTumorApp(cfg, upload_dir=str(tmp_path / "up"))
    pred = a._get_predictor()
    assert a.weights_source == path

    # joint checkpoint also enables the trained grade head: uploads
    # report a model-predicted grade instead of the volume ladder
    g = pred.classify_grade(np.zeros((16, 16, 16), np.float32))
    assert g is not None
    grade, conf = g
    assert 0 <= grade <= 3 and 0.0 < conf <= 1.0


def test_http_server_over_socket(app):
    """Socket-level smoke: real ThreadingHTTPServer + urllib round trip."""
    import threading
    import urllib.request
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.serve.app import (
        create_server)
    server = create_server("127.0.0.1", 0, app=app)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health", timeout=10) as r:
            assert r.status == 200
            assert json.loads(r.read())["status"] == "ok"
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/", timeout=10) as r:
            assert b"<html" in r.read()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/start_training",
            data=json.dumps({"mode": "demo", "epochs": 1,
                             "epoch_seconds": 0.05}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=10) as r:
            j = json.loads(r.read())
            assert j["success"]
        # oversized request is refused with 413 BEFORE the body is read
        # (parity with the reference's 100 MB MAX_CONTENT_LENGTH,
        # main.py:94) — send only headers claiming a huge body
        import http.client
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.putrequest("POST", "/upload")
        conn.putheader("Content-Type", "application/octet-stream")
        conn.putheader("Content-Length", str(200 * 1024 * 1024))
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 413
        assert json.loads(resp.read())["error"] == "request body too large"
        conn.close()
    finally:
        server.shutdown()


def test_index_page_ui_protocol():
    """The UI page carries the full endpoint protocol plus the
    experience-parity features (drag-drop, staged narration, offline
    demo fallback — reference templates/index.html:967-1035,1447-1492)."""
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.serve import (
        templates)
    page = templates.index_page()
    for needle in ("/upload", "/start_training", "/training_progress",
                   "/stop_training", "/generate_synthetic_data",
                   'id="drop"', "dragover", "demoAnalysis", "STAGES",
                   "sparkline", "offline demo",
                   # round 3: offline training simulator + rich results
                   "simulateTraining", "not real training",
                   "renderResults", "showTab", "mcard",
                   "visualization_3d", "v3dframe", "srcdoc"):
        assert needle in page, needle
    # the training fallback must trigger on fetch failure, not replace
    # the real path
    assert page.index("fetch('/start_training'") < \
        page.index("simulateTraining(cfg.epochs)")


def test_background_warmup_sets_state(app):
    """warmup_app compiles the upload-route programs and surfaces its
    state at /health (main() runs it in a daemon thread so the socket
    answers during the compile)."""
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.serve.app import (
        warmup_app)
    assert app.warmup_state == "off"
    warmup_app(app, native_shape=(32, 32, 24))
    assert app.warmup_state == "done"
    status, _, payload = _get(app, "/health")
    assert json.loads(payload)["warmup"] == "done"


def test_warmup_policy_off_and_upload(app):
    """InferenceConfig.warmup gates the startup compiles: "off" skips
    everything (first request compiles lazily); "upload" warms only the
    program /upload will run, not the whole-volume demo program; an
    unknown policy fails loudly instead of silently lazier warmup.

    The module-scoped fixture is restored afterwards — later tests must
    see the real config/predictor, not this test's spy."""
    from dataclasses import replace
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.serve.app import (
        warmup_app)

    saved = (app.config, app._get_predictor, app.warmup_state)
    try:
        app.config = replace(app.config, inference=replace(
            app.config.inference, warmup="off"))
        app._get_predictor = None   # would raise if warmup touched it
        warmup_app(app)
        assert app.warmup_state == "skipped"

        app.config = replace(app.config, inference=replace(
            app.config.inference, warmup="Full"))   # typo'd policy
        warmup_app(app)
        assert app.warmup_state.startswith("failed: unknown warmup")

        calls = []

        class _Spy:
            def segment_with_confidence(self, vol, mode):
                calls.append(mode)
                return None, None

            def classify_tumor(self, vol):
                calls.append("classify")
                return "t", 0.5

        app.config = replace(app.config, inference=replace(
            app.config.inference, warmup="upload", upload_mode="cropped"))
        app._get_predictor = lambda: _Spy()
        warmup_app(app, native_shape=(16, 16, 12))
        assert app.warmup_state == "done"
        assert "whole_volume" not in calls and "cropped" in calls
    finally:
        app.config, app._get_predictor, app.warmup_state = saved


def test_model_arch_accepts_reference_form_values():
    """The reference UI's modelArch option values (unet3d / lightweight
    / enhanced, templates/index.html:669-673) must resolve — the
    reference backend silently ignored the field (web_training.py:67);
    here it selects the feature ladder."""
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.serve.jobs import (
        _arch_features)
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.serve import (
        templates)
    compact, full = (16, 32, 64, 128), (32, 64, 128, 256, 512)
    assert _arch_features("unet3d") == compact
    assert _arch_features("lightweight") == compact
    assert _arch_features("enhanced") == full
    assert _arch_features("attention_unet") == compact
    assert _arch_features("attention_unet_full") == full
    assert _arch_features("joint") == compact
    assert _arch_features("joint_full") == full
    page = templates.index_page()
    for v in ("unet3d", "lightweight", "enhanced", "joint"):
        assert f'value="{v}"' in page, v


def test_upload_clinical_volumes_use_scan_spacing(app, tmp_path, rng):
    """A native-res (cropped) upload reports clinical volumes in real
    mm^3 from the scan's affine — two uploads of identical voxel data
    differing only in header spacing must differ by |det| (here 2.16x);
    identity-affine uploads reproduce the reference's 1 mm^3 numbers."""
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.data import (
        nifti)

    vol = rng.normal(0.5, 0.2, (16, 16, 16)).astype(np.float32)
    vol[4:10, 4:10, 4:10] += 2.0      # a bright blob to segment
    aff = np.array([[0.0, -1.0, 0.0, 5.0], [0.9, 0.0, 0.0, -2.0],
                    [0.0, 0.0, 2.4, 8.0], [0.0, 0.0, 0.0, 1.0]])

    def upload(affine):
        p = str(tmp_path / "u.nii.gz")
        nifti.save(p, vol, affine=affine)
        data = open(p, "rb").read()
        boundary = "BA"
        body = (f"--{boundary}\r\n"
                'Content-Disposition: form-data; name="file"; '
                'filename="u.nii.gz"\r\n\r\n').encode() + data + (
            f"\r\n--{boundary}--\r\n").encode()
        _, _, payload = app.route(
            "POST", "/upload", {}, body,
            {"content-type": f"multipart/form-data; boundary={boundary}"})
        j = json.loads(payload)
        assert j["success"] and j["degraded_mode"] is False
        return float(j["measurements"]["tumor_volume"].split()[0])

    v_iso = upload(None)                    # identity affine
    v_aniso = upload(aff)
    if v_iso > 0:
        assert v_aniso == pytest.approx(2.16 * v_iso, rel=0.01)
    else:
        assert v_aniso == 0.0


def test_shape_metrics_unit_consistency_under_spacing():
    """spacing_mm keeps volume (mm^3) and surface area (mm^2)
    consistent: a physical 8 mm-radius sphere sampled on a (1,1,2) mm
    grid (so an ellipsoid in voxel space) must report compactness ~1
    — and ~the same volume/area/diameter as the isotropically sampled
    sphere. Without spacing the same mask would read as an oblate
    ellipsoid (compactness well below 1)."""
    r = 8.0
    zz, yy, xx = np.mgrid[:32, :32, :16].astype(np.float32)
    aniso = (((zz - 16) * 1.0) ** 2 + ((yy - 16) * 1.0) ** 2 +
             ((xx - 8) * 2.0) ** 2) <= r * r
    img = np.zeros_like(aniso, np.float32)
    m_aniso = calculate_medical_metrics(img, aniso.astype(np.uint8),
                                        spacing_mm=(1.0, 1.0, 2.0))

    zz, yy, xx = np.mgrid[:32, :32, :32].astype(np.float32)
    iso = ((zz - 16) ** 2 + (yy - 16) ** 2 + (xx - 16) ** 2) <= r * r
    m_iso = calculate_medical_metrics(np.zeros_like(iso, np.float32),
                                      iso.astype(np.uint8))

    assert m_aniso["tumor_volume_mm3"] == pytest.approx(
        m_iso["tumor_volume_mm3"], rel=0.05)
    assert m_aniso["surface_area"] == pytest.approx(
        m_iso["surface_area"], rel=0.10)
    assert m_aniso["equivalent_diameter"] == pytest.approx(2 * r,
                                                           rel=0.05)
    assert 0.8 < m_aniso["compactness"] < 1.2
    # voxel-units computation on the same mask sees an oblate ellipsoid
    m_novox = calculate_medical_metrics(img, aniso.astype(np.uint8))
    assert m_novox["compactness"] < m_aniso["compactness"]


def test_upload_returns_mask_nifti(app, tmp_path, rng):
    """return_mask=1 adds the predicted label map as base64 .nii.gz
    carrying the input scan's affine (native-res path) — the reference
    returns only rendered pictures (main.py:859-895)."""
    import base64
    import gzip
    import io as _io
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.data import (
        nifti)

    vol = rng.normal(0.5, 0.2, (16, 16, 16)).astype(np.float32)
    vol[4:10, 4:10, 4:10] += 2.0
    aff = np.diag([1.0, 1.0, 2.0, 1.0])
    aff[:3, 3] = (3.0, -1.0, 7.0)
    p = str(tmp_path / "m.nii.gz")
    nifti.save(p, vol, affine=aff)
    boundary = "BM"
    body = (f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="return_mask"\r\n\r\n'
            "1\r\n"
            f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="file"; '
            'filename="m.nii.gz"\r\n\r\n').encode() + open(p, "rb").read() + (
        f"\r\n--{boundary}--\r\n").encode()
    _, _, payload = app.route(
        "POST", "/upload", {}, body,
        {"content-type": f"multipart/form-data; boundary={boundary}"})
    j = json.loads(payload)
    assert j["success"] and j["degraded_mode"] is False
    assert j["mask_grid"] == "native"
    raw = gzip.decompress(base64.b64decode(j["mask_nifti_base64"]))
    tmp = tmp_path / "mask.nii"
    tmp.write_bytes(raw)
    img = nifti.load(str(tmp))
    assert img.data.shape == (16, 16, 16)
    assert set(np.unique(img.data)) <= {0, 1, 2, 3}
    np.testing.assert_allclose(img.affine, aff, atol=1e-5)

    # without the field, no mask in the response (payload size control)
    body2 = body.replace(b'name="return_mask"\r\n\r\n1',
                         b'name="return_mask"\r\n\r\n0')
    _, _, payload2 = app.route(
        "POST", "/upload", {}, body2,
        {"content-type": f"multipart/form-data; boundary={boundary}"})
    assert "mask_nifti_base64" not in json.loads(payload2)


def test_sheared_affine_volume_uses_det_and_numpy_spacing_ok():
    """|det| is the voxel volume under shear (column-norm product
    overestimates); numpy-array spacing must not crash on the
    truthiness checks."""
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.data import (
        nifti)

    shear = np.array([[1.0, 0.5, 0.0, 0.0],
                      [0.0, 1.0, 0.0, 0.0],
                      [0.0, 0.0, 2.0, 0.0],
                      [0.0, 0.0, 0.0, 1.0]])
    sp = nifti.affine_spacing(shear)
    det = nifti.affine_voxel_volume(shear)
    assert det == pytest.approx(2.0)            # |det| exact
    assert float(np.prod(sp)) > det             # norms overestimate

    seg = np.zeros((8, 8, 8), np.uint8)
    seg[2:6, 2:6, 2:6] = 1
    img = np.zeros_like(seg, np.float32)
    m = calculate_medical_metrics(img, seg, spacing_mm=sp,
                                  voxel_volume_mm3=det)
    assert m["tumor_volume_mm3"] == pytest.approx(64 * det)
    # numpy-array spacing exercises the former truthiness crash
    m2 = calculate_medical_metrics(img, seg,
                                   spacing_mm=np.array([1.0, 1.0, 2.0]))
    assert m2["tumor_volume_mm3"] == pytest.approx(128.0)
    assert m2["surface_area"] > 0


def test_degraded_return_mask_never_carries_scan_affine(app, tmp_path):
    """A failed/undecodable upload falls back to the synthetic demo
    analysis; its returned mask must be model-grid with identity
    affine — stamping the user's scan registration onto a synthetic
    mask would make it overlay 'correctly' on a real patient scan."""
    import base64
    import gzip
    from segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.data import (
        nifti)

    boundary = "BD"
    body = (f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="return_mask"\r\n\r\n'
            "1\r\n"
            f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="file"; '
            'filename="broken.nii.gz"\r\n\r\n').encode() + b"not a nifti" + (
        f"\r\n--{boundary}--\r\n").encode()
    _, _, payload = app.route(
        "POST", "/upload", {}, body,
        {"content-type": f"multipart/form-data; boundary={boundary}"})
    j = json.loads(payload)
    assert j["success"] and j["degraded_mode"] is True
    assert j["mask_grid"] == "model"
    raw = gzip.decompress(base64.b64decode(j["mask_nifti_base64"]))
    p = tmp_path / "d.nii"
    p.write_bytes(raw)
    np.testing.assert_allclose(nifti.load(str(p)).affine, np.eye(4))


def test_concurrent_session_ids_unique():
    """Same-second /start_training requests must not collide on the
    session id (the second would overwrite the first's session dict and
    stop Event, making the first run unstoppable)."""
    import threading
    mgr = TrainingJobManager()
    ids = []
    lock = threading.Lock()

    def go():
        sid = mgr.start_training_session({"mode": "demo", "epochs": 1})
        with lock:
            ids.append(sid)

    threads = [threading.Thread(target=go) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(set(ids)) == 8
    for sid in ids:
        mgr.stop_training_session(sid)


def test_web_numeric_inputs_are_capped(monkeypatch, app):
    """Unauthenticated JSON magnitudes are clamped: a tiny request body
    must not be able to demand unbounded disk/CPU."""
    captured = {}

    def fake_gen(n, out_dir, shape=(96, 96, 64), **kw):
        captured.update(n=n, shape=shape)
        return out_dir

    import segmentation_and_classification_of_brain_tumor_using_3d_unet_tpu.data.synthetic as synth
    monkeypatch.setattr(synth, "create_enhanced_synthetic_data",
                        fake_gen)
    status, _, payload = _post_json(app, "/generate_synthetic_data", {
        "num_samples": 10**6, "shape": [4096, 4096, 4096]})
    assert status == 200 and json.loads(payload)["success"]
    assert captured["n"] <= 500
    assert all(s <= 256 for s in captured["shape"])


def test_report_uses_measured_surface_area():
    """The clinical report's surface area is the MEASURED isosurface
    value from the metrics dict, not a sphere-equivalent recompute
    (which understates irregular tumors by 2x+)."""
    metrics = {"tumor_volume_mm3": 4000.0, "surface_area": 3141.5,
               "compactness": 0.3, "dice_score": 0.9,
               "hausdorff_distance": 2.0}
    rep = generate_clinical_report(metrics, filename="t")
    assert rep["measurements"]["surface_area"] == "3141.5 mm²"
    joined = " ".join(rep["clinical_notes"]["findings"])
    assert "3141.5" in joined
