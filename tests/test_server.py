"""HTTP serving endpoint: exported text encoder + packed index end to end."""

import pytest
import json
import threading

import http.client

import jax
import jax.numpy as jnp
import numpy as np

from cmh_tpu.config import config_from_dict
from cmh_tpu.export import export_encoders, load_encoders
from cmh_tpu.models.clip.tokenizer import SimpleTokenizer, tokenize_caption
from cmh_tpu.models.dcmht import DCMHTMethod
from cmh_tpu.server import RetrievalApp, make_server
from cmh_tpu.serving import RetrievalIndex


def _request(port, method, path, payload=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    body = json.dumps(payload) if payload is not None else None
    conn.request(method, path, body=body,
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    out = json.loads(resp.read())
    conn.close()
    return resp.status, out


def test_http_server_cross_modal_end_to_end(tmp_path):
    """The full deployment loop over real HTTP: export a text encoder,
    index image codes, start the server, and answer (a) raw-code and
    (b) natural-language queries — responses must equal the direct
    library calls exactly; malformed requests get 400/404, not a crash."""
    W = 12
    cfg_model = config_from_dict(
        {"model": {"clip_variant": "tiny", "hash_func": "softmax"}}).model
    method = DCMHTMethod.from_config(cfg_model, output_dim=8)
    res = method.clip_cfg.image_resolution
    rng = np.random.RandomState(17)
    image = jnp.asarray(rng.randn(8, res, res, 3), jnp.float32)
    text = jnp.asarray(rng.randint(1, 49405, (8, W)), jnp.int32)
    kpm = jnp.zeros((8, W), bool)
    variables = method.init_variables(
        jax.random.PRNGKey(4),
        {"image": image, "text": text, "key_padding_mask": kpm})
    enc_path = str(tmp_path / "enc.cmh")
    export_encoders(method, variables, enc_path, max_words=W)

    enc = load_encoders(enc_path)
    gallery_codes = enc.encode_image(np.asarray(image))
    index = RetrievalIndex(bits=8)
    index.add(gallery_codes)

    tokenizer = SimpleTokenizer()
    app = RetrievalApp(index, enc, tokenizer, backend="cpu", max_words=W,
                       image_size=res)
    server = make_server(app, port=0)  # ephemeral port
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        status, health = _request(port, "GET", "/healthz")
        assert status == 200
        assert health == {"count": 8, "bits": 8, "backend": "cpu",
                          "text": True}

        # raw-code search ≡ direct library call
        queries = rng.choice([-1.0, 1.0], size=(3, 8)).astype(np.float32)
        status, out = _request(port, "POST", "/search",
                               {"codes": queries.tolist(), "topk": 4})
        assert status == 200
        want_d, want_i = index.search_cpu(queries, topk=4)
        assert out["dist"] == want_d.tolist()
        assert out["idx"] == want_i.tolist()

        # natural-language query ≡ tokenize + exported encoder + search
        captions = ["a dog on the grass", "two people riding bikes"]
        status, out = _request(port, "POST", "/search_text",
                               {"text": captions, "topk": 3})
        assert status == 200
        ids, masks = zip(*(tokenize_caption(tokenizer, c, W)
                           for c in captions))
        q_codes = enc.encode_text(np.stack(ids), np.stack(masks))
        want_d, want_i = index.search_cpu(
            np.asarray(q_codes, np.float32), topk=3)
        assert out["dist"] == want_d.tolist()
        assert out["idx"] == want_i.tolist()

        # raw-image query ≡ eval transform + exported encoder + search
        import base64
        import io
        from PIL import Image
        from cmh_tpu.data.transforms import eval_transform

        raws = [Image.fromarray(
            rng.randint(0, 255, (40, 52, 3), dtype=np.uint8))
            for _ in range(2)]
        blobs = []
        for im in raws:
            buf = io.BytesIO()
            im.save(buf, format="PNG")
            blobs.append(base64.b64encode(buf.getvalue()).decode())
        status, out = _request(port, "POST", "/search_image",
                               {"image_b64": blobs, "topk": 3})
        assert status == 200
        pix = np.stack([eval_transform(im, res) for im in raws])
        q_img = enc.encode_image(pix)
        want_d, want_i = index.search_cpu(
            np.asarray(q_img, np.float32), topk=3)
        assert out["dist"] == want_d.tolist()
        assert out["idx"] == want_i.tolist()

        # error paths: named 400s and 404s, server stays up
        status, out = _request(port, "POST", "/search",
                               {"codes": queries.tolist(), "topk": 999})
        assert status == 400 and "topk" in out["error"]
        status, out = _request(port, "POST", "/search",
                               {"codes": [[1.0, -1.0]]})  # wrong width
        assert status == 400
        status, _ = _request(port, "POST", "/nonsense", {})
        assert status == 404
        status, out = _request(port, "POST", "/search", {})  # missing field
        assert status == 400 and "codes" in out["error"]
        status, out = _request(port, "POST", "/search_image",
                               {"image_b64": ["aGVsbG8="]})  # b64, not image
        assert status == 400 and "image_b64[0]" in out["error"]
        status, _ = _request(port, "GET", "/healthz")
        assert status == 200  # still alive after the errors
    finally:
        server.shutdown()
        server.server_close()


def test_server_without_encoders_rejects_text():
    index = RetrievalIndex(bits=8)
    index.add(np.sign(np.random.RandomState(0).randn(4, 8)) + 0.0)
    app = RetrievalApp(index, backend="cpu")
    assert app.healthz()["text"] is False
    import pytest
    with pytest.raises(ValueError, match="search_text"):
        app.search_text({"text": ["hi"]})


@pytest.mark.slow
def test_build_index_tool_end_to_end(tmp_path):
    """python -m cmh_tpu.tools.build_index: trained weights → serving index
    + encoder export in one pass, through the trainer's exact eval path.
    The packed gallery must equal the trainer's own retrieval codes, and
    the emitted pair must answer a text query through RetrievalApp."""
    import os
    import subprocess
    import sys

    from util_methods import tiny_trainer

    tr = tiny_trainer(tmp_path / "run", "DCMHT", "DCMHTTrainer",
                      model_extra={"hash_func": "softmax"})
    tr.save_model(str(tmp_path / "run"), epoch=0)
    model_file = [f for f in os.listdir(tmp_path / "run")
                  if f.startswith("model-")][0]

    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        """
model: {arch: DCMHT, clip_path: /nonexistent.pt, clip_variant: tiny, hash_func: softmax}
optimizer: {arch: BertAdam, lr: 0.002, clip_lr: 0.0005}
dataset: {arch: synthetic_dataset, name: synthetic, num_classes: 4, image_resolution: 32, max_word: 12}
run: {arch: DCMHTTrainer, output_dim: 8, batch_size: 16, train_num: 32,
      query_num: 16, epochs: 1, display_step: 1000, seed: 5}
"""
    )
    env = dict(os.environ, CMH_TPU_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "-m", "cmh_tpu.tools.build_index",
         "--config-file", str(cfg),
         "--model", str(tmp_path / "run" / model_file),
         "--out-index", str(tmp_path / "gallery"),
         "--out-encoders", str(tmp_path / "enc.cmh")],
        capture_output=True, text=True, timeout=420, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    meta = json.loads(proc.stdout.strip().splitlines()[-1])
    assert meta["items"] == tr.retrieval_num and meta["bits"] == 8

    index = RetrievalIndex.load(str(tmp_path / "gallery.npz"))
    assert len(index) == tr.retrieval_num
    # gallery codes == the trainer's own eval path (same seed, same weights)
    want_img, _ = tr.get_code(tr.retrieval_loader, tr.retrieval_num)
    from cmh_tpu.serving import _pack_bits_host
    np.testing.assert_array_equal(
        index._host_packed if index._host_packed is not None
        else np.concatenate(index._chunks, axis=0),
        _pack_bits_host(np.asarray(want_img, np.float32)))

    # the emitted pair serves a text query end to end
    enc = load_encoders(str(tmp_path / "enc.cmh"))
    app = RetrievalApp(index, enc, SimpleTokenizer(), backend="cpu",
                       max_words=12)
    out = app.search_text({"text": ["a red car"], "topk": 3})
    assert len(out["idx"][0]) == 3
