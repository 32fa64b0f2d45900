"""Authentication / authorization plugin surface (SURVEY §2.10 adjacent).

Mirrors the reference's auth plugin set (src/auth/Authentication.java,
AuthState.java, Authorization.java, Permissions.java,
AllowAllAuthenticatingAuthorizer.java): a TSD embeds one Authentication
plugin; each connection is authenticated once (telnet first line or HTTP
request), yielding an immutable AuthState carried with the channel; an
optional Authorization plugin then allows/denies individual operations and
queries per user.

The Spark engine has no Netty channel — handlers are plain functions — so
the state rides with the request dict: front-ends call
``authenticate_http(request)`` once per connection/request and the
permissioned handlers (`api.handle_query`, `api.handle_put`) consult
``check_permission`` before doing work. The default plugin is the
reference's AllowAll analog, so nothing changes until an operator installs
a real plugin via ``configure_auth``.
"""

from __future__ import annotations

from dataclasses import dataclass

# reference src/auth/AuthState.java AuthStatus enum
SUCCESS = "SUCCESS"
UNAUTHORIZED = "UNAUTHORIZED"
FORBIDDEN = "FORBIDDEN"
REDIRECTED = "REDIRECTED"
ERROR = "ERROR"
REVOKED = "REVOKED"

# reference src/auth/Permissions.java
PERMISSIONS = (
    "TELNET_PUT", "HTTP_PUT", "HTTP_QUERY",
    "CREATE_TAGK", "CREATE_TAGV", "CREATE_METRIC",
)


@dataclass(frozen=True)
class AuthState:
    """Immutable per-connection state (reference AuthState.java:40-80:
    getUser / getStatus / getMessage; replaced, never mutated)."""

    user: str
    status: str = SUCCESS
    message: str | None = None


class AuthError(PermissionError):
    """Raised by the handler-side guard on a non-SUCCESS state."""

    def __init__(self, state: AuthState):
        super().__init__(f"{state.status}: {state.message or state.user}")
        self.state = state


class Authorization:
    """Per-operation / per-query decisions (reference Authorization.java:
    hasPermission + allowQuery). Return a NEW AuthState (possibly the input
    one) — never raise (ERROR status instead)."""

    def initialize(self, spark) -> None:  # pragma: no cover
        pass

    def shutdown(self) -> None:  # pragma: no cover
        pass

    def version(self) -> str:  # pragma: no cover
        return "2.4.0"

    def collect_stats(self) -> dict:  # pragma: no cover
        return {}

    def has_permission(self, state: AuthState, permission: str) -> AuthState:
        raise NotImplementedError

    def allow_query(self, state: AuthState, tsquery) -> AuthState:
        raise NotImplementedError


class Authentication:
    """Connection authentication (reference Authentication.java:36-127).
    ``authenticate_telnet`` gets the split first command line;
    ``authenticate_http`` gets the request dict (front-ends stash headers
    under '_headers'). Implementations return an AuthState — ERROR status
    rather than raising."""

    def initialize(self, spark) -> None:  # pragma: no cover
        pass

    def shutdown(self) -> None:  # pragma: no cover
        pass

    def version(self) -> str:  # pragma: no cover
        return "2.4.0"

    def collect_stats(self) -> dict:  # pragma: no cover
        return {}

    def authenticate_telnet(self, command: list[str]) -> AuthState:
        raise NotImplementedError

    def authenticate_http(self, request: dict) -> AuthState:
        raise NotImplementedError

    def authorization(self) -> Authorization | None:
        return None

    def is_ready(self, state: AuthState | None) -> bool:
        # reference Authentication.isReady: the channel carries a usable
        # SUCCESS state once authentication completed
        return state is not None and state.status == SUCCESS


class AllowAllAuthenticatingAuthorizer(Authentication, Authorization):
    """The reference's default-open plugin
    (src/auth/AllowAllAuthenticatingAuthorizer.java): every connection
    authenticates as 'anonymous', every operation is allowed."""

    def authenticate_telnet(self, command: list[str]) -> AuthState:
        return AuthState("anonymous")

    def authenticate_http(self, request: dict) -> AuthState:
        return AuthState("anonymous")

    def authorization(self) -> Authorization:
        return self

    def has_permission(self, state: AuthState, permission: str) -> AuthState:
        if permission not in PERMISSIONS:
            return AuthState(state.user, FORBIDDEN, f"unknown permission {permission}")
        return state

    def allow_query(self, state: AuthState, tsquery) -> AuthState:
        return state


_PLUGIN: Authentication = AllowAllAuthenticatingAuthorizer()
_ENABLED = False  # tsd.core.authentication.enable analog


def configure_auth(plugin: Authentication | None, enabled: bool = True) -> None:
    """Install the process-wide auth plugin (tsd.core.authentication.enable
    + .plugin). None restores the default-open AllowAll with auth off."""
    global _PLUGIN, _ENABLED
    _PLUGIN = plugin if plugin is not None else AllowAllAuthenticatingAuthorizer()
    _ENABLED = enabled and plugin is not None


def get_auth() -> Authentication:
    return _PLUGIN


def auth_enabled() -> bool:
    return _ENABLED


def check_permission(request: dict, permission: str) -> AuthState:
    """Handler-side guard: authenticate the request (or reuse the state a
    front-end stashed under '_auth_state'), then consult the Authorization
    plugin for the permission. Raises AuthError on any non-SUCCESS state;
    a no-op returning an anonymous SUCCESS state while auth is disabled."""
    if not _ENABLED:
        return AuthState("anonymous")
    state = request.get("_auth_state")
    if state is None:
        state = _PLUGIN.authenticate_http(request)
    if state.status != SUCCESS:
        raise AuthError(state)
    authz = _PLUGIN.authorization()
    if authz is not None:
        state = authz.has_permission(state, permission)
        if state.status != SUCCESS:
            raise AuthError(state)
    return state


def check_telnet(command: list[str], permission: str,
                 state: AuthState | None = None) -> AuthState:
    """Telnet-side guard (reference RpcHandler authenticates the first line
    via Authentication.authenticate_telnet before dispatching): reuse the
    connection's SUCCESS state or authenticate this command, then check the
    permission. Raises AuthError on any non-SUCCESS state; no-op while auth
    is disabled. Returns the state for the caller to cache per connection."""
    if not _ENABLED:
        return AuthState("anonymous")
    if state is None or state.status != SUCCESS:
        state = _PLUGIN.authenticate_telnet(command)
    if state.status != SUCCESS:
        raise AuthError(state)
    authz = _PLUGIN.authorization()
    if authz is not None:
        checked = authz.has_permission(state, permission)
        if checked.status != SUCCESS:
            raise AuthError(checked)
    return state


def check_query(request: dict, tsquery) -> AuthState:
    """HTTP_QUERY permission + per-query allowQuery hook."""
    state = check_permission(request, "HTTP_QUERY")
    if not _ENABLED:
        return state
    authz = _PLUGIN.authorization()
    if authz is not None:
        state = authz.allow_query(state, tsquery)
        if state.status != SUCCESS:
            raise AuthError(state)
    return state
