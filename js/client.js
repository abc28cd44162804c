/** Dependency-free client for the soundswallower_tpu serving endpoint
 * (serve.py): browser and Node >= 18 (global fetch).  See index.d.ts
 * for the typed schema. */

function b64(bytes) {
  if (typeof Buffer !== "undefined") return Buffer.from(bytes).toString("base64");
  let s = "";
  const u8 = new Uint8Array(bytes);
  for (let i = 0; i < u8.length; i += 0x8000)
    s += String.fromCharCode.apply(null, u8.subarray(i, i + 0x8000));
  return btoa(s);
}

export class AlignClient {
  constructor(baseUrl = "http://127.0.0.1:8000") {
    this.baseUrl = baseUrl.replace(/\/$/, "");
  }

  async _post(path, body) {
    const res = await fetch(this.baseUrl + path, {
      method: "POST",
      headers: { "Content-Type": "application/json" },
      body: JSON.stringify(body),
    });
    const out = await res.json();
    if (!res.ok) throw new Error(out.error || `HTTP ${res.status}`);
    return out;
  }

  async _get(path) {
    const res = await fetch(this.baseUrl + path);
    const out = await res.json();
    if (!res.ok) throw new Error(out.error || `HTTP ${res.status}`);
    return out;
  }

  /** audio: Int16Array of PCM samples at the model's sample rate. */
  align(audio, text) {
    return this._post("/v1/align", {
      text,
      audio: b64(new Uint8Array(audio.buffer, audio.byteOffset, audio.byteLength)),
    });
  }

  /** audio: Float32Array of samples in [-1, 1]. */
  alignFloat32(audio, text) {
    return this._post("/v1/align", {
      text,
      audio_f32: b64(new Uint8Array(audio.buffer, audio.byteOffset, audio.byteLength)),
    });
  }

  health() {
    return this._get("/v1/health");
  }

  config() {
    return this._get("/v1/config");
  }
}

export default AlignClient;
