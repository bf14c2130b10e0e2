import { useState } from "react";
import { submitImages } from "../api.js";
import DropZone from "./DropZone.jsx";
import FileChips from "./FileChips.jsx";

/** The upload form: files + min/max cluster sizes (default 3/6 — this
 * server honors them; the reference's handler ignored the fields and
 * hardcoded (3,6), handlers.go:111). */
export default function UploadForm() {
  const [files, setFiles] = useState([]);
  const [minSize, setMinSize] = useState(3);
  const [maxSize, setMaxSize] = useState(6);
  const [busy, setBusy] = useState(false);
  const [status, setStatus] = useState("");
  const [banner, setBanner] = useState(null); // {kind, text, viewUrl?}

  const submit = async () => {
    setBusy(true);
    setBanner(null);
    setStatus("");
    try {
      const data = await submitImages(files, minSize, maxSize, setStatus);
      const n = Object.keys(data.clusters || {}).length;
      setBanner({
        kind: "ok",
        text: `Done — ${n} clusters. `,
        viewUrl: data.viewUrl || "/api/view",
      });
      setFiles([]);
    } catch (err) {
      setBanner({ kind: "err", text: `Error: ${err.message || err}` });
    }
    setBusy(false);
  };

  return (
    <div className="card">
      <h1>
        ImageClust <span style={{ color: "var(--accent)" }}>TPU</span>
      </h1>
      <div className="sub">
        Upload images; they are embedded and clustered on TPU.
      </div>

      <DropZone onFiles={(add) => setFiles((cur) => [...cur, ...add])} />

      <div className="sizes">
        <label>
          Min cluster size
          <input
            type="number"
            min="1"
            value={minSize}
            onChange={(e) => setMinSize(Number(e.target.value))}
          />
        </label>
        <label>
          Max cluster size
          <input
            type="number"
            min="1"
            value={maxSize}
            onChange={(e) => setMaxSize(Number(e.target.value))}
          />
        </label>
      </div>

      <FileChips
        files={files}
        onRemove={(i) => setFiles((cur) => cur.filter((_, j) => j !== i))}
      />

      <button className="go" disabled={busy || files.length === 0}
              onClick={submit}>
        {busy ? (
          <>
            <span className="spinner" />
            Clustering…{status ? ` (${status})` : ""}
          </>
        ) : (
          "Cluster images"
        )}
      </button>

      {banner && (
        <div className={`banner ${banner.kind}`}>
          {banner.text}
          {banner.viewUrl && (
            <a href={banner.viewUrl} target="_blank" rel="noreferrer">
              Open report
            </a>
          )}
        </div>
      )}
    </div>
  );
}
