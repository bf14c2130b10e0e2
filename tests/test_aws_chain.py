"""AWS default credential chain (VERDICT r1 item 8): parity with
aws-sdk-go-v2 config.LoadDefaultConfig (the reference's non-DEV path,
rekognition.go:55-78) — env, web identity, shared profiles (incl. assumed
roles), container endpoint, IMDSv2 — all mock-HTTP tested."""

import time

import pytest

import imageclust_tpu.utils.aws as aws
from imageclust_tpu.utils.aws import AwsCredentials, AwsError, resolve_credentials

_STS_XML = """<AssumeRoleWithWebIdentityResponse
  xmlns="https://sts.amazonaws.com/doc/2011-06-15/">
  <AssumeRoleWithWebIdentityResult>
    <Credentials>
      <AccessKeyId>ASIAWEB</AccessKeyId>
      <SecretAccessKey>websecret</SecretAccessKey>
      <SessionToken>webtoken</SessionToken>
      <Expiration>2099-01-01T00:00:00Z</Expiration>
    </Credentials>
  </AssumeRoleWithWebIdentityResult>
</AssumeRoleWithWebIdentityResponse>"""

_ASSUME_XML = _STS_XML.replace("WithWebIdentity", "").replace(
    "ASIAWEB", "ASIAROLE").replace("websecret", "rolesecret").replace(
    "webtoken", "roletoken")


@pytest.fixture(autouse=True)
def clean_chain(monkeypatch, tmp_path):
    """Isolate every test from the box's real environment and the cache."""
    for var in ("AWS_ACCESS_KEY_ID", "AWS_SECRET_ACCESS_KEY",
                "AWS_SESSION_TOKEN", "AWS_WEB_IDENTITY_TOKEN_FILE",
                "AWS_ROLE_ARN", "AWS_PROFILE",
                "AWS_CONTAINER_CREDENTIALS_RELATIVE_URI",
                "AWS_CONTAINER_CREDENTIALS_FULL_URI",
                "AWS_CONTAINER_AUTHORIZATION_TOKEN"):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setenv("AWS_SHARED_CREDENTIALS_FILE",
                       str(tmp_path / "credentials"))
    monkeypatch.setenv("AWS_CONFIG_FILE", str(tmp_path / "config"))
    monkeypatch.setenv("AWS_EC2_METADATA_DISABLED", "true")
    monkeypatch.setattr(aws, "_CACHE", None)
    yield


class TestChainOrder:
    def test_env_wins(self, monkeypatch):
        monkeypatch.setenv("AWS_ACCESS_KEY_ID", "AKENV")
        monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "SKENV")
        c = resolve_credentials()
        assert (c.access_key, c.secret_key) == ("AKENV", "SKENV")
        assert not c.expired()

    def test_nothing_found_raises_with_chain_summary(self):
        with pytest.raises(AwsError, match="env, web identity, shared"):
            resolve_credentials()


class TestWebIdentity:
    def test_assume_role_with_web_identity(self, monkeypatch, tmp_path):
        import requests

        tok = tmp_path / "token"
        tok.write_text("oidc-jwt")
        monkeypatch.setenv("AWS_WEB_IDENTITY_TOKEN_FILE", str(tok))
        monkeypatch.setenv("AWS_ROLE_ARN", "arn:aws:iam::1:role/pod")
        seen = {}

        class Resp:
            status_code = 200
            text = _STS_XML

        def fake_post(url, data=None, headers=None, timeout=None):
            seen["url"], seen["data"] = url, data
            return Resp()

        monkeypatch.setattr(requests, "post", fake_post)
        c = resolve_credentials()
        assert c.access_key == "ASIAWEB"
        assert c.session_token == "webtoken"
        assert c.expiry > time.time()
        assert seen["data"]["Action"] == "AssumeRoleWithWebIdentity"
        assert seen["data"]["WebIdentityToken"] == "oidc-jwt"


class TestSharedProfiles:
    def test_credentials_file_default_profile(self, monkeypatch, tmp_path):
        (tmp_path / "credentials").write_text(
            "[default]\naws_access_key_id=AKFILE\n"
            "aws_secret_access_key=SKFILE\naws_session_token=TOK\n")
        c = resolve_credentials()
        assert (c.access_key, c.secret_key, c.session_token) == (
            "AKFILE", "SKFILE", "TOK")

    def test_named_profile_from_config_file(self, monkeypatch, tmp_path):
        (tmp_path / "config").write_text(
            "[profile prod]\naws_access_key_id=AKPROD\n"
            "aws_secret_access_key=SKPROD\n")
        monkeypatch.setenv("AWS_PROFILE", "prod")
        c = resolve_credentials()
        assert c.access_key == "AKPROD"

    def test_role_arn_profile_assumes_via_sts(self, monkeypatch, tmp_path):
        import requests

        (tmp_path / "credentials").write_text(
            "[base]\naws_access_key_id=AKBASE\n"
            "aws_secret_access_key=SKBASE\n"
            "[default]\nrole_arn=arn:aws:iam::1:role/admin\n"
            "source_profile=base\n")
        seen = {}

        class Resp:
            status_code = 200
            text = _ASSUME_XML

        def fake_post(url, data=None, headers=None, timeout=None):
            seen["headers"] = headers
            return Resp()

        monkeypatch.setattr(requests, "post", fake_post)
        c = resolve_credentials()
        assert c.access_key == "ASIAROLE"
        # the AssumeRole call was SigV4-signed with the source profile
        assert seen["headers"]["Authorization"].startswith(
            "AWS4-HMAC-SHA256 Credential=AKBASE/")


class TestContainer:
    def test_relative_uri(self, monkeypatch):
        import requests

        monkeypatch.setenv("AWS_CONTAINER_CREDENTIALS_RELATIVE_URI",
                           "/v2/credentials/abc")
        monkeypatch.setenv("AWS_CONTAINER_AUTHORIZATION_TOKEN", "Bearer x")
        seen = {}

        class Resp:
            status_code = 200

            def json(self):
                return {"AccessKeyId": "AKECS", "SecretAccessKey": "SKECS",
                        "Token": "ecstoken",
                        "Expiration": "2099-01-01T00:00:00Z"}

        def fake_get(url, headers=None, timeout=None):
            seen["url"], seen["headers"] = url, headers
            return Resp()

        monkeypatch.setattr(requests, "get", fake_get)
        c = resolve_credentials()
        assert c.access_key == "AKECS"
        assert seen["url"].endswith("/v2/credentials/abc")
        assert seen["url"].startswith("http://169.254.170.2")
        assert seen["headers"]["Authorization"] == "Bearer x"


class TestImds:
    def test_imdsv2_flow(self, monkeypatch):
        import requests

        monkeypatch.setenv("AWS_EC2_METADATA_DISABLED", "false")
        calls = []

        class Resp:
            def __init__(self, text="", js=None, status=200):
                self.text = text
                self._js = js
                self.status_code = status

            def json(self):
                return self._js

        def fake_put(url, headers=None, timeout=None):
            calls.append(("put", url, headers))
            assert headers["X-aws-ec2-metadata-token-ttl-seconds"] == "21600"
            return Resp(text="imds-token")

        def fake_get(url, headers=None, timeout=None):
            calls.append(("get", url, headers))
            assert headers["X-aws-ec2-metadata-token"] == "imds-token"
            if url.endswith("security-credentials/"):
                return Resp(text="my-instance-role\n")
            return Resp(js={
                "Code": "Success", "AccessKeyId": "AKIMDS",
                "SecretAccessKey": "SKIMDS", "Token": "imdscreds",
                "Expiration": "2099-01-01T00:00:00Z",
            })

        monkeypatch.setattr(requests, "put", fake_put)
        monkeypatch.setattr(requests, "get", fake_get)
        c = resolve_credentials()
        assert c.access_key == "AKIMDS"
        assert c.session_token == "imdscreds"
        assert calls[0][0] == "put"  # IMDSv2 token first, never v1

    def test_not_on_ec2_is_clean_miss(self, monkeypatch):
        import requests

        monkeypatch.setenv("AWS_EC2_METADATA_DISABLED", "false")

        def boom(*a, **k):
            raise OSError("connection refused")

        monkeypatch.setattr(requests, "put", boom)
        with pytest.raises(AwsError, match="no AWS credentials"):
            resolve_credentials()


class TestCache:
    def test_caches_until_near_expiry(self, monkeypatch):
        calls = {"n": 0}

        def counting_env():
            calls["n"] += 1
            return AwsCredentials("AK", "SK",
                                  expiry=time.time() + 3600)

        monkeypatch.setattr(aws, "_from_static_env", counting_env)
        a = resolve_credentials()
        b = resolve_credentials()
        assert a is b and calls["n"] == 1

    def test_refreshes_expired(self, monkeypatch):
        calls = {"n": 0}

        def counting_env():
            calls["n"] += 1
            return AwsCredentials("AK", "SK", expiry=time.time() + 1)

        monkeypatch.setattr(aws, "_from_static_env", counting_env)
        resolve_credentials()
        resolve_credentials()  # inside the 5-min refresh margin -> re-resolve
        assert calls["n"] == 2
