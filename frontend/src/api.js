// API client for the clustering service (routes: docs/API.md).
// Mirrors the flow contract pinned by tests/test_spa.py against the
// prebuilt page: multipart POST to /api/cluster, async submission above
// ASYNC_THRESHOLD files with 1.5 s polling of /api/result.

export const ASYNC_THRESHOLD = 50;
export const POLL_INTERVAL_MS = 1500;
export const POLL_MAX_ATTEMPTS = 2400; // ~1 h cap

const sleep = (ms) => new Promise((r) => setTimeout(r, ms));

export async function pollResult(jobId, onStatus) {
  let transientFailures = 0;
  for (let attempt = 0; attempt < POLL_MAX_ATTEMPTS; attempt++) {
    await sleep(POLL_INTERVAL_MS);
    let resp, body;
    try {
      resp = await fetch(`/api/result?job=${jobId}`);
      body = await resp.json();
      transientFailures = 0;
    } catch (err) {
      // a network blip must not abandon a job still running server-side
      if (++transientFailures >= 5) throw err;
      continue;
    }
    if (!resp.ok) {
      throw new Error((body && body.error) || "job no longer available");
    }
    if (body.clusters) return body;
    if (body.status === "failed") throw new Error(body.error || "job failed");
    if (onStatus) onStatus(body.status || "waiting");
  }
  throw new Error("timed out waiting for the job result");
}

export async function submitImages(files, minSize, maxSize, onStatus) {
  const form = new FormData();
  files.forEach((f) => form.append("images", f));
  form.append("minClusterSize", String(minSize));
  form.append("maxClusterSize", String(maxSize));
  const useAsync = files.length > ASYNC_THRESHOLD;
  const url = "/api/cluster" + (useAsync ? "?async=1" : "");
  const resp = await fetch(url, { method: "POST", body: form });
  let data = await resp.json();
  if (resp.status === 202 && data.jobId) {
    const result = await pollResult(data.jobId, onStatus);
    data = {
      status: "success",
      clusters: result.clusters,
      viewUrl: `/api/view?job=${data.jobId}`,
    };
  }
  if (data.status !== "success") {
    throw new Error(data.error || resp.statusText);
  }
  return data;
}
