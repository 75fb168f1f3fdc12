"""Static filter configuration — blocklists and constants.

Mirrors the *semantics* of the reference's config package
(/root/reference/pkg/config/config.go:7-203):

- ``IGNORED_EXTENSIONS`` — link path *extension* exact-match, lowercased
  (reference ``isIgnoredExtension``, pkg/commoncrawl/wat.go:707-713).
- ``IGNORED_TLDS`` — domain *suffix* match, lowercased (``ignoreTLD``,
  wat.go:716-723).
- ``IGNORED_DOMAINS`` — registrable-domain exact match, lowercased
  (``isIgnoredDomain``, wat.go:699-704). The reference ships ~180 popular
  domains (config.go:17-196); the set is operator-tunable data, not engine
  semantics — we ship a representative default and accept overrides.
- ``IGNORED_QUERY_PREFIXES`` — raw query blanked out when it *starts with*
  any prefix (``ignoreQuery``, wat.go:726-733; list config.go:199-203).

In Spark these become literal arrays compiled into ``isin()`` hash sets /
``rlike`` anchors — broadcast automatically with the plan (SURVEY §1.4).
"""

from __future__ import annotations

# Media / document / archive extensions whose link targets carry no backlink
# value. Exact match on the final ".ext" of the path, lowercased.
IGNORED_EXTENSIONS: tuple[str, ...] = (
    # images
    ".ai", ".bmp", ".gif", ".ico", ".jpeg", ".jpg", ".png", ".psd", ".svg",
    ".tif", ".tiff",
    # video
    ".3g2", ".3gp", ".avi", ".flv", ".h264", ".m4v", ".mkv", ".mov", ".mp4",
    ".mpeg", ".mpg", ".rm", ".swf", ".vob", ".wmv",
    # audio
    ".aif", ".cda", ".mid", ".midi", ".mp3", ".mpa", ".ogg", ".wav", ".wma",
    ".wpl",
    # documents / data
    ".css", ".csv", ".doc", ".docx", ".js", ".odt", ".ods", ".pdf", ".ppsx",
    ".ps", ".rtf", ".tex", ".txt", ".wks", ".wpd", ".wps", ".xlr", ".xls",
    ".xlsx", ".xml",
    # archives
    ".7z", ".arj", ".deb", ".gz", ".pkg", ".rar", ".rpm", ".z", ".zip",
)

# Domain suffixes dropped wholesale (pages AND links).
IGNORED_TLDS: tuple[str, ...] = (".cn", ".blogspot.com")

# Registrable domains whose inbound links are noise at web scale (search
# engines, social networks, shorteners, CDNs...). Representative default —
# the full production list is operator data.
IGNORED_DOMAINS: tuple[str, ...] = (
    "addthis.com", "addtoany.com", "adobe.com", "amazon.com", "amazonaws.com",
    "amzn.to", "apple.com", "baidu.com", "bit.ly", "blogger.com",
    "blogspot.com", "cnn.com", "creativecommons.org", "doi.org", "ebay.com",
    "europa.eu", "facebook.com", "flickr.com", "github.com", "goo.gl",
    "google.com", "gravatar.com", "instagram.com", "linkedin.com",
    "medium.com", "microsoft.com", "mozilla.org", "paypal.com",
    "pinterest.com", "qq.com", "reddit.com", "shopify.com", "soundcloud.com",
    "t.co", "tiktok.com", "tinyurl.com", "tumblr.com", "twitter.com",
    "vimeo.com", "vk.com", "w3.org", "whatsapp.com", "wikipedia.org",
    "wordpress.com", "wordpress.org", "yahoo.com", "yandex.ru",
    "youtube.com", "youtu.be",
)

# Raw queries beginning with these are tracking/noise → blanked to "".
IGNORED_QUERY_PREFIXES: tuple[str, ...] = ("lang", "utm_", "ref")

# Characters that invalidate a host outright (``validateHost``,
# wat.go:595-610). Kept as one string for a single ContainsAny-style rlike.
BAD_HOST_CHARS: str = "%[]=':*()<>!&+,}{$\";`"

# Compiled-once regex sources (reference wat.go:121-125).
IPV4_REGEX: str = r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"
VALID_DOMAIN_REGEX: str = (
    r"^(?i)([a-z0-9]([a-z0-9-]{0,61}[a-z0-9])?\.)+[a-z]{2,}$"
)

# Max raw-query length kept (``verifyRecordQuality``, wat.go:582-585).
MAX_QUERY_LENGTH: int = 200
