"""Web serving tier — stdlib HTTP server, no Flask dependency.

Same route surface and JSON contracts as the reference Flask app
(``main.py:710-910``), with the headline fix that ``/upload`` runs REAL
TPU inference (the reference routes every upload through
``simulate_brain_tumor_analysis``, ``main.py:848``) and ``/stop_training``
actually stops the session (the reference's is a no-op ack,
``main.py:756-763``). ``/generate_synthetic_data`` really generates data
(reference stub only logs, ``main.py:804-826``).

Demo-mode degradation is preserved as an explicit option: a synthetic
analysis path used when requested (``demo=1``) or when decoding/inference
fails (reference's ubiquitous try/except->demo contract).
"""

from __future__ import annotations

import json
import logging
import os
import re
import threading
import time
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional, Tuple
from urllib.parse import parse_qs, urlparse

from ..config import Config
from . import templates
from .jobs import training_manager
from .reports import calculate_medical_metrics, generate_clinical_report

logger = logging.getLogger(__name__)

# upload cap, parity with the reference's MAX_CONTENT_LENGTH
# (``main.py:94``); requests past it are refused before the body is
# read so a client cannot make the server allocate arbitrary memory
MAX_CONTENT_LENGTH = 100 * 1024 * 1024


# ---------------------------------------------------------------------------
# minimal multipart/form-data parser (stdlib only)
# ---------------------------------------------------------------------------

def parse_multipart(body: bytes, content_type: str) -> Dict[str, Dict]:
    """Returns {field: {'filename': str|None, 'data': bytes}}."""
    m = re.search(r'boundary="?([^";]+)"?', content_type)
    if not m:
        raise ValueError("no multipart boundary")
    boundary = m.group(1).encode()
    parts = body.split(b"--" + boundary)
    out: Dict[str, Dict] = {}
    for part in parts:
        # each part is "\r\n<headers>\r\n\r\n<data>\r\n"; the final
        # element is the "--\r\n" terminator. Remove exactly ONE
        # delimiter CRLF on each side — stripping all trailing CR/LF
        # would corrupt binary payloads ending in 0x0A/0x0D.
        if part.startswith(b"--") or not part:
            continue
        part = part.removeprefix(b"\r\n")
        if b"\r\n\r\n" not in part:
            continue
        head, data = part.split(b"\r\n\r\n", 1)
        data = data.removesuffix(b"\r\n")
        headers = head.decode("utf-8", "replace")
        name_m = re.search(r'name="([^"]*)"', headers)
        file_m = re.search(r'filename="([^"]*)"', headers)
        if not name_m:
            continue
        out[name_m.group(1)] = {
            "filename": file_m.group(1) if file_m else None,
            "data": data,
        }
    return out


def resolve_under(root: str, user_path: Optional[str]) -> Optional[str]:
    """Resolve a client-supplied path against *root*, refusing escapes.

    The server binds 0.0.0.0 and the training/synthetic routes accept
    directory paths from unauthenticated JSON; without this, a request
    could create directories and write files anywhere the process can.
    """
    if not user_path:
        return None
    root_abs = os.path.realpath(root)
    cand = os.path.realpath(os.path.join(root_abs, user_path))
    if cand != root_abs and not cand.startswith(root_abs + os.sep):
        raise ValueError(f"path escapes data root: {user_path!r}")
    return cand


def secure_filename(name: str) -> str:
    name = os.path.basename(name.replace("\\", "/"))
    name = re.sub(r"[^A-Za-z0-9._-]", "_", name)
    return name or "upload"


# ---------------------------------------------------------------------------
# application
# ---------------------------------------------------------------------------

class BrainTumorApp:
    """Holds models + job manager; route logic lives here so it can be
    tested without sockets."""

    def __init__(self, config: Optional[Config] = None,
                 upload_dir: str = "uploads",
                 lazy_models: bool = True,
                 predictor=None):
        self.config = config or Config()
        self.upload_dir = upload_dir
        os.makedirs(upload_dir, exist_ok=True)
        self._predictor = predictor
        self._predictor_lock = threading.Lock()
        self.warmup_state = "off"
        if not lazy_models and self._predictor is None:
            self._get_predictor()

    def _get_predictor(self):
        with self._predictor_lock:
            if self._predictor is None:
                from ..inference.predictor import Predictor
                logger.info("initializing models on %s",
                            _device_label())
                self._predictor = Predictor(self.config)
                self._load_trained_weights(self._predictor)
            return self._predictor

    weights_source: str = "random_init"

    def _load_trained_weights(self, predictor) -> None:
        """Adopt trained segmentation weights: an explicit
        ``InferenceConfig.checkpoint`` path, or the newest structurally
        compatible ``best_*`` checkpoint under ``models_dir`` — so
        web/CLI training feeds straight into serving. Incompatible or
        absent checkpoints leave the reference's untrained-model
        behavior (``main.py:330-354``) with ``weights_source`` saying
        so in ``/health``."""
        from ..train.checkpoints import adopt_trained_weights

        spec = getattr(self.config.inference, "checkpoint", "")
        path = adopt_trained_weights(
            predictor, spec, self.config.models_dir, logger)
        if path:
            self.weights_source = path
            logger.info("serving with trained weights from %s", path)
        elif spec and spec != "none":
            logger.warning("configured checkpoint %s not loaded; "
                           "serving random init", spec)

    # ------------------------- routes -------------------------

    def route(self, method: str, path: str, query: Dict,
              body: bytes, headers: Dict) -> Tuple[int, str, str]:
        """Dispatch; returns (status, content_type, payload)."""
        try:
            if method == "GET":
                if path == "/":
                    return 200, "text/html", templates.index_page()
                if path == "/metrics":
                    return 200, "text/html", templates.metrics_page(
                        self.model_info())
                if path == "/documentation":
                    return 200, "text/html", templates.documentation_page()
                if path == "/training_progress":
                    return self._training_progress(query)
                if path == "/health":
                    return self._json({
                        "status": "ok", "device": _device_label(),
                        "models_loaded": self._predictor is not None,
                        "warmup": self.warmup_state,
                        "weights": self.weights_source,
                        "sessions": training_manager.list_sessions(),
                    })
            if method == "POST":
                if path == "/upload":
                    return self._upload(body, headers)
                if path == "/start_training":
                    return self._start_training(body)
                if path == "/stop_training":
                    return self._stop_training(body)
                if path == "/generate_synthetic_data":
                    return self._generate_synthetic(body)
            return 404, "application/json", json.dumps(
                {"success": False, "error": f"no route {method} {path}"})
        except Exception as e:
            logger.error("route error: %s\n%s", e, traceback.format_exc())
            return 500, "application/json", json.dumps({
                "success": False, "error": str(e),
                "demo_available": True,
                "message": "Server analysis failed, but demo mode is "
                           "available",
            })

    def model_info(self) -> Dict:
        mc = self.config.model
        return {
            "device": _device_label(),
            "architecture": "Attention-gated residual 3D U-Net "
                            "(deep supervision)",
            "features": str(tuple(mc.features)),
            "compute dtype": mc.compute_dtype,
            "inference": f"Gaussian sliding window "
                         f"{self.config.inference.roi_size}, overlap "
                         f"{self.config.inference.overlap}",
        }

    # ------------------------- helpers -------------------------

    @staticmethod
    def _json(obj, status: int = 200) -> Tuple[int, str, str]:
        return status, "application/json", json.dumps(obj)

    def _upload(self, body: bytes, headers: Dict) -> Tuple[int, str, str]:
        ctype = headers.get("content-type", "")
        fields = parse_multipart(body, ctype) if (
            "multipart" in ctype) else {}
        demo = fields.get("demo", {}).get("data", b"0") == b"1"
        return_mask = fields.get("return_mask",
                                 {}).get("data", b"0") == b"1"
        fobj = fields.get("file")
        filename = "synthetic_demo.nii"
        filepath = None
        ts = time.strftime("%Y%m%d_%H%M%S")

        try:
            if fobj and fobj.get("filename"):
                filename = fobj["filename"]
                # uuid suffix: ThreadingHTTPServer handles uploads
                # concurrently, and two same-named files in the same
                # second would clobber each other mid-analysis (one
                # patient would receive the other's report)
                import uuid
                filepath = os.path.join(
                    self.upload_dir,
                    f"{ts}_{uuid.uuid4().hex[:8]}_"
                    f"{secure_filename(filename)}")
                with open(filepath, "wb") as f:
                    f.write(fobj["data"])

            analysis = self._analyze(filepath, demo,
                                     return_mask=return_mask)
            payload = {
                "success": True,
                "patient_info": {
                    "study_id": f"STU_{ts}",
                    "series_id": "SER_001",
                    "scan_date": time.strftime("%Y-%m-%d"),
                    "filename": filename,
                },
                **analysis,
            }
            return self._json(payload)
        finally:
            if filepath and os.path.exists(filepath):
                os.remove(filepath)

    def _analyze(self, filepath: Optional[str], demo: bool,
                 return_mask: bool = False) -> Dict:
        """Upload pipeline: decode -> preprocess -> segment (+confidence)
        -> classify -> metrics -> visualizations -> clinical report.
        Logs per-phase wall time at INFO. ``return_mask`` adds the
        predicted label map itself as base64 .nii.gz (with the input
        scan's affine) — the reference returns only rendered pictures
        (``main.py:859-895``); a segmentation service should hand back
        the segmentation."""
        from ..data.synthetic import synthesize_volume
        from ..utils.visualization import ModernMedicalVisualizer

        t0 = time.time()

        def mark(phase):
            nonlocal t0
            logger.info("upload %s: %.1fs", phase, time.time() - t0)
            t0 = time.time()

        size = self.config.data.image_size
        mode = self.config.inference.upload_mode
        vol = None
        cls_conf = None
        spacing_mm = None
        vox_mm3 = None
        in_affine = None
        if filepath and not demo:
            try:
                from ..inference.predictor import preprocess_image
                # cropped/sliding_window segment at NATIVE resolution
                # (the north-star capability); whole_volume reproduces
                # the reference's destructive zoom (main.py:382-398)
                vol = preprocess_image(
                    filepath, size if mode == "whole_volume" else None)
                if mode != "whole_volume":
                    # native-res path: clinical volumes/areas in the
                    # report use the scan's true per-axis voxel size
                    # (affine column norms); the whole_volume path
                    # resamples the grid, where header spacing no
                    # longer applies
                    try:
                        from ..data import nifti as _nifti
                        in_affine = _nifti.load_affine(filepath)
                        spacing_mm = _nifti.affine_spacing(in_affine)
                        vox_mm3 = _nifti.affine_voxel_volume(in_affine)
                    except Exception:
                        pass
                mark("preprocess")
                predictor = self._get_predictor()
                seg, conf = predictor.segment_with_confidence(
                    vol, mode=mode,
                    tta=getattr(self.config.inference, "tta", False))
                mark("segment")
                cls_name, cls_conf = predictor.classify_tumor(vol, seg)
                grade_pred = predictor.classify_grade(vol)
                mark("classify")
                quality_conf = conf
                degraded = False
            except Exception as e:
                logger.warning("real inference failed (%s); falling back "
                               "to demo analysis", e)
                vol = None
        if vol is None:   # demo / degraded path — explicit, synthetic
            vol, seg = synthesize_volume(size, seed=0)
            quality_conf = None
            cls_name = None
            grade_pred = None
            degraded = True

        metrics = calculate_medical_metrics(
            vol, seg,
            confidence_map=None if degraded else quality_conf,
            spacing_mm=None if degraded else spacing_mm,
            voxel_volume_mm3=None if degraded else vox_mm3)
        report = generate_clinical_report(
            metrics, filename=filepath or "demo",
            classifier_confidence=cls_conf,
            model_grade=grade_pred[0] if grade_pred else None,
            grade_confidence=grade_pred[1] if grade_pred else None)
        mark("metrics+report")

        viz = ModernMedicalVisualizer()
        visualizations = {
            "multiplanar": viz.create_segmentation_overlay(vol, seg),
            "analysis": viz.create_volume_analysis_dashboard(vol, seg),
            "visualization_3d": viz.create_3d_tumor_reconstruction(seg),
        }
        mark("visualizations")
        if cls_name is not None:
            report["classification"]["model_classification"] = cls_name
        out = {
            "classification": report["classification"],
            "measurements": report["measurements"],
            "quality_metrics": report["quality_metrics"],
            "clinical_notes": report["clinical_notes"],
            "visualizations": visualizations,
            "degraded_mode": degraded,
        }
        if return_mask:
            import base64
            import gzip as _gzip
            import numpy as _np3
            from ..data import nifti as _nifti
            # the grid is decided by the path actually taken: native-res
            # modes paste the mask back onto the input grid (its affine
            # applies, when readable); whole_volume resamples to the
            # model grid; a degraded fallback is a SYNTHETIC model-grid
            # mask and must never carry the real scan's registration
            native_grid = not degraded and mode != "whole_volume"
            payload = _gzip.compress(_nifti.encode(
                _np3.asarray(seg).astype(_np3.uint8),
                affine=in_affine if native_grid else None))
            out["mask_nifti_base64"] = base64.b64encode(
                payload).decode("ascii")
            out["mask_grid"] = "native" if native_grid else "model"
            mark("mask encode")
        return out

    def _start_training(self, body: bytes) -> Tuple[int, str, str]:
        try:
            cfg = json.loads(body or b"{}")
        except json.JSONDecodeError:
            return self._json({"success": False,
                               "error": "invalid JSON"}, 400)
        try:
            safe_dir = resolve_under(self.config.data_dir,
                                     cfg.get("data_dir"))
        except ValueError as e:
            return self._json({"success": False, "error": str(e)}, 400)
        if safe_dir is not None:
            cfg["data_dir"] = safe_dir
        else:
            cfg.pop("data_dir", None)
        session_id = training_manager.start_training_session(cfg)
        return self._json({
            "success": True, "session_id": session_id,
            "message": "Training started successfully",
        })

    def _stop_training(self, body: bytes) -> Tuple[int, str, str]:
        try:
            cfg = json.loads(body or b"{}")
        except json.JSONDecodeError:
            cfg = {}
        sid = cfg.get("session_id")
        ok = training_manager.stop_training_session(sid) if sid else False
        return self._json({
            "success": True,
            "stopped": ok,
            "message": "Training stopped" if ok else
                       "No such session; nothing to stop",
        })

    def _training_progress(self, query: Dict) -> Tuple[int, str, str]:
        sid = (query.get("session_id") or ["demo"])[0]
        progress = training_manager.get_training_progress(sid)
        if progress is None:
            return self._json({"status": "not_found",
                               "error": f"unknown session {sid}"}, 404)
        return self._json(progress)

    def _generate_synthetic(self, body: bytes) -> Tuple[int, str, str]:
        from ..data.synthetic import create_enhanced_synthetic_data
        try:
            cfg = json.loads(body or b"{}")
        except json.JSONDecodeError:
            cfg = {}
        # unauthenticated JSON on a 0.0.0.0 socket: cap the magnitudes
        # (the body-size guard stops huge payloads but not tiny JSON
        # requesting disk/CPU exhaustion — 10^6 samples of 512^3)
        n = max(1, min(int(cfg.get("num_samples", 100)), 500))
        try:
            out_dir = resolve_under(self.config.data_dir,
                                    cfg.get("save_dir"))
        except ValueError as e:
            return self._json({"success": False, "error": str(e)}, 400)
        if out_dir is None:
            out_dir = os.path.join(self.config.data_dir,
                                   "synthetic", "BraTS2024")
        shape = tuple(max(8, min(int(s), 256))
                      for s in cfg.get("shape", (96, 96, 64)))[:3]
        create_enhanced_synthetic_data(n, out_dir, shape=shape)
        return self._json({
            "success": True, "num_samples": n, "save_dir": out_dir,
            "message": f"Generated {n} synthetic BraTS samples",
        })


def _device_label() -> str:
    try:
        import jax
        d = jax.devices()[0]
        return f"{d.platform}:{d.device_kind}"
    except Exception:
        return "unavailable"


# ---------------------------------------------------------------------------
# HTTP plumbing
# ---------------------------------------------------------------------------

def make_handler(app: BrainTumorApp):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            logger.info("%s " + fmt, self.address_string(), *args)

        def _serve(self, method):
            parsed = urlparse(self.path)
            query = parse_qs(parsed.query)
            length = int(self.headers.get("Content-Length") or 0)
            if length > MAX_CONTENT_LENGTH:
                data = json.dumps({
                    "error": "request body too large",
                    "max_bytes": MAX_CONTENT_LENGTH}).encode()
                self.send_response(413)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.send_header("Connection", "close")
                self.end_headers()
                self.wfile.write(data)
                return
            body = self.rfile.read(length) if length else b""
            headers = {k.lower(): v for k, v in self.headers.items()}
            status, ctype, payload = app.route(
                method, parsed.path, query, body, headers)
            data = payload.encode() if isinstance(payload, str) else payload
            self.send_response(status)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            self._serve("GET")

        def do_POST(self):
            self._serve("POST")

    return Handler


def create_server(host: str = "0.0.0.0", port: int = 5000,
                  config: Optional[Config] = None,
                  app: Optional[BrainTumorApp] = None
                  ) -> ThreadingHTTPServer:
    app = app or BrainTumorApp(config)
    server = ThreadingHTTPServer((host, port), make_handler(app))
    server.app = app   # type: ignore[attr-defined]
    return server


def warmup_app(app, native_shape=(240, 240, 155)) -> None:
    """Compile the inference programs the upload route will use.

    Run in a background thread by ``main`` so the socket answers
    immediately; an upload that arrives mid-warmup simply waits on the
    predictor lock / XLA compile it would have paid anyway. The
    reference builds its models at import time for the same reason
    (``main.py:330-354``). State is surfaced at ``/health``.
    """
    import numpy as _np
    policy = getattr(app.config.inference, "warmup", "full")
    if policy not in ("full", "upload", "off"):
        # a typo'd policy must not silently degrade to lazier warmup —
        # the operator would discover it as a 30-150s cold compile on
        # the first request they believed was pre-warmed
        app.warmup_state = (f"failed: unknown warmup policy "
                            f"{policy!r} (use full|upload|off)")
        logger.warning("%s", app.warmup_state)
        return
    if policy == "off":
        app.warmup_state = "skipped"
        return
    app.warmup_state = "running"
    try:
        pred = app._get_predictor()
        size = app.config.data.image_size
        zeros = _np.zeros(size, _np.float32)
        mode = app.config.inference.upload_mode
        if policy == "full" or mode == "whole_volume":
            pred.segment_with_confidence(zeros, mode="whole_volume")
        pred.classify_tumor(zeros)           # classifier jit
        if mode != "whole_volume":
            # native-resolution path: warm on a skull-stripped-shaped
            # fixture so the crop bucket matches a typical BraTS brain
            native = tuple(native_shape)
            vol = _np.zeros(native, _np.float32)
            c = [s // 2 for s in native]
            # brain fills ~62% / 75% / 85% of each axis (BraTS-typical)
            semi = tuple(max(2.0, f * s) for f, s in
                         zip((0.31, 0.375, 0.43), native))
            zz, yy, xx = _np.ogrid[:native[0], :native[1], :native[2]]
            brain = (((zz - c[0]) / semi[0]) ** 2 +
                     ((yy - c[1]) / semi[1]) ** 2 +
                     ((xx - c[2]) / semi[2]) ** 2) < 1.0
            vol[brain] = 0.5
            pred.segment_with_confidence(vol, mode=mode)
        app.warmup_state = "done"
        logger.info("inference warmup complete")
    except Exception as e:
        app.warmup_state = f"failed: {e}"
        logger.warning("warmup failed (serving anyway): %s", e)


def main(host: str = "0.0.0.0", port: int = 5000,
         warmup: bool = True, config: Optional[Config] = None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    from ..environment import ensure_compilation_cache
    ensure_compilation_cache()   # warm restarts skip the 30-150s compiles
    server = create_server(host, port, config=config)
    if warmup:
        threading.Thread(target=warmup_app, args=(server.app,),
                         daemon=True, name="warmup").start()
    else:
        server.app.warmup_state = "skipped"   # type: ignore[attr-defined]
    print("=" * 60)
    print("Brain Tumor Segmentation System (TPU-native)")
    print(f"Serving at http://{host}:{port}")
    print("=" * 60)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        print("\nServer stopped by user")


if __name__ == "__main__":
    import argparse
    _ap = argparse.ArgumentParser(description=__doc__)
    _ap.add_argument("--host", default="0.0.0.0")
    _ap.add_argument("--port", type=int, default=5000)
    _ap.add_argument("--warmup", choices=("full", "upload", "off"),
                     default=None,
                     help="startup compile policy (InferenceConfig."
                          "warmup): full = whole-volume + upload-mode "
                          "programs, upload = only what /upload runs, "
                          "off = compile lazily on first request")
    _args = _ap.parse_args()
    _cfg = None
    if _args.warmup is not None:
        from dataclasses import replace as _replace
        _base = Config()
        _cfg = _replace(_base, inference=_replace(
            _base.inference, warmup=_args.warmup))
    main(host=_args.host, port=_args.port, config=_cfg)
