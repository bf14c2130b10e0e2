"""Minimal AWS SigV4-signed HTTP client.

boto3 / the AWS SDK are not in this image, so the Rekognition and Bedrock
backends (parity with internal/rekognition/rekognition.go:33-78 and
internal/ai/*/: the reference uses aws-sdk-go-v2) sign requests directly.
Credential resolution mirrors the reference's DEV_MODE/static-env scheme
(rekognition.go:37-53): AWS_ACCESS_KEY_ID / AWS_SECRET_ACCESS_KEY
(+ AWS_SESSION_TOKEN) from the environment.
"""

from __future__ import annotations

import datetime
import hashlib
import hmac
import json
import os
import urllib.parse
from dataclasses import dataclass

__all__ = ["AwsCredentials", "sign_request", "aws_post_json", "AwsError"]


class AwsError(RuntimeError):
    def __init__(self, status: int, body: str):
        super().__init__(f"AWS request failed: HTTP {status}: {body[:500]}")
        self.status = status
        self.body = body


@dataclass(frozen=True)
class AwsCredentials:
    access_key: str
    secret_key: str
    session_token: str = ""

    @classmethod
    def from_env(cls) -> "AwsCredentials":
        ak = os.environ.get("AWS_ACCESS_KEY_ID", "")
        sk = os.environ.get("AWS_SECRET_ACCESS_KEY", "")
        if not ak or not sk:
            raise AwsError(
                0,
                "AWS credentials not found in environment variables",
            )
        return cls(ak, sk, os.environ.get("AWS_SESSION_TOKEN", ""))


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode(), hashlib.sha256).digest()


def sign_request(
    method: str,
    url: str,
    region: str,
    service: str,
    headers: dict[str, str],
    body: bytes,
    creds: AwsCredentials,
    now: datetime.datetime | None = None,
) -> dict[str, str]:
    """Return ``headers`` plus Authorization/X-Amz-* per AWS SigV4."""
    now = now or datetime.datetime.now(datetime.timezone.utc)
    amz_date = now.strftime("%Y%m%dT%H%M%SZ")
    date_stamp = now.strftime("%Y%m%d")

    parsed = urllib.parse.urlparse(url)
    host = parsed.netloc
    canonical_uri = urllib.parse.quote(parsed.path or "/")
    canonical_query = parsed.query  # assumed pre-canonical (we use none)

    payload_hash = hashlib.sha256(body).hexdigest()
    all_headers = {
        **{k.lower(): v.strip() for k, v in headers.items()},
        "host": host,
        "x-amz-date": amz_date,
    }
    if creds.session_token:
        all_headers["x-amz-security-token"] = creds.session_token
    signed_names = sorted(all_headers)
    canonical_headers = "".join(f"{k}:{all_headers[k]}\n" for k in signed_names)
    signed_headers = ";".join(signed_names)

    canonical_request = "\n".join(
        [method, canonical_uri, canonical_query, canonical_headers,
         signed_headers, payload_hash]
    )
    scope = f"{date_stamp}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join(
        ["AWS4-HMAC-SHA256", amz_date, scope,
         hashlib.sha256(canonical_request.encode()).hexdigest()]
    )
    k = _hmac(("AWS4" + creds.secret_key).encode(), date_stamp)
    k = _hmac(k, region)
    k = _hmac(k, service)
    k = _hmac(k, "aws4_request")
    signature = hmac.new(k, string_to_sign.encode(), hashlib.sha256).hexdigest()

    out = dict(headers)
    out["X-Amz-Date"] = amz_date
    if creds.session_token:
        out["X-Amz-Security-Token"] = creds.session_token
    out["Authorization"] = (
        f"AWS4-HMAC-SHA256 Credential={creds.access_key}/{scope}, "
        f"SignedHeaders={signed_headers}, Signature={signature}"
    )
    return out


def aws_post_json(
    url: str,
    region: str,
    service: str,
    payload: dict | bytes,
    target: str | None = None,
    content_type: str = "application/x-amz-json-1.1",
    creds: AwsCredentials | None = None,
    timeout: float = 30.0,
) -> dict:
    """Signed POST returning parsed JSON; raises AwsError on non-2xx."""
    import requests

    creds = creds or AwsCredentials.from_env()
    body = payload if isinstance(payload, bytes) else json.dumps(payload).encode()
    headers = {"Content-Type": content_type}
    if target:
        headers["X-Amz-Target"] = target
    signed = sign_request("POST", url, region, service, headers, body, creds)
    resp = requests.post(url, data=body, headers=signed, timeout=timeout)
    if resp.status_code // 100 != 2:
        raise AwsError(resp.status_code, resp.text)
    return resp.json()
