#include "xml.h"

#include <cctype>

namespace dwbc_host {
namespace {

struct Cursor {
  const std::string& s;
  size_t i = 0;
  bool eof() const { return i >= s.size(); }
  char peek() const { return s[i]; }
  void skip_ws() {
    while (!eof() && std::isspace(static_cast<unsigned char>(s[i]))) ++i;
  }
  bool starts_with(const char* p) const {
    return s.compare(i, std::char_traits<char>::length(p), p) == 0;
  }
};

std::string parse_name(Cursor& c) {
  size_t start = c.i;
  while (!c.eof()) {
    char ch = c.peek();
    if (std::isalnum(static_cast<unsigned char>(ch)) || ch == '_' || ch == '-' ||
        ch == ':' || ch == '.')
      ++c.i;
    else
      break;
  }
  return c.s.substr(start, c.i - start);
}

void skip_misc(Cursor& c) {
  for (;;) {
    c.skip_ws();
    if (c.starts_with("<!--")) {
      size_t end = c.s.find("-->", c.i + 4);
      c.i = (end == std::string::npos) ? c.s.size() : end + 3;
    } else if (c.starts_with("<?")) {
      size_t end = c.s.find("?>", c.i + 2);
      c.i = (end == std::string::npos) ? c.s.size() : end + 2;
    } else if (c.starts_with("<!")) {  // DOCTYPE etc.
      size_t end = c.s.find('>', c.i + 2);
      c.i = (end == std::string::npos) ? c.s.size() : end + 1;
    } else {
      return;
    }
  }
}

std::unique_ptr<XmlNode> parse_element(Cursor& c, std::string* error);

bool parse_attrs(Cursor& c, XmlNode* node, std::string* error) {
  for (;;) {
    c.skip_ws();
    if (c.eof()) {
      *error = "unexpected EOF in attributes";
      return false;
    }
    if (c.peek() == '>' || c.peek() == '/') return true;
    std::string key = parse_name(c);
    if (key.empty()) {
      *error = "bad attribute name";
      return false;
    }
    c.skip_ws();
    if (c.eof() || c.peek() != '=') {
      *error = "expected '=' after attribute " + key;
      return false;
    }
    ++c.i;
    c.skip_ws();
    if (c.eof() || (c.peek() != '"' && c.peek() != '\'')) {
      *error = "expected quoted attribute value for " + key;
      return false;
    }
    char quote = c.peek();
    ++c.i;
    size_t end = c.s.find(quote, c.i);
    if (end == std::string::npos) {
      *error = "unterminated attribute value for " + key;
      return false;
    }
    node->attrs.emplace_back(key, c.s.substr(c.i, end - c.i));
    c.i = end + 1;
  }
}

std::unique_ptr<XmlNode> parse_element(Cursor& c, std::string* error) {
  if (c.eof() || c.peek() != '<') {
    *error = "expected '<'";
    return nullptr;
  }
  ++c.i;
  auto node = std::make_unique<XmlNode>();
  node->tag = parse_name(c);
  if (node->tag.empty()) {
    *error = "empty tag name";
    return nullptr;
  }
  if (!parse_attrs(c, node.get(), error)) return nullptr;
  if (c.starts_with("/>")) {
    c.i += 2;
    return node;
  }
  if (c.peek() != '>') {
    *error = "expected '>' after tag " + node->tag;
    return nullptr;
  }
  ++c.i;
  for (;;) {
    skip_misc(c);
    if (c.eof()) {
      *error = "unexpected EOF inside <" + node->tag + ">";
      return nullptr;
    }
    if (c.starts_with("</")) {
      c.i += 2;
      std::string close = parse_name(c);
      c.skip_ws();
      if (close != node->tag || c.eof() || c.peek() != '>') {
        *error = "mismatched close tag </" + close + "> for <" + node->tag + ">";
        return nullptr;
      }
      ++c.i;
      return node;
    }
    if (c.peek() == '<') {
      auto child = parse_element(c, error);
      if (!child) return nullptr;
      node->children.push_back(std::move(child));
    } else {
      // text content: URDF carries no meaningful text nodes — skip.
      while (!c.eof() && c.peek() != '<') ++c.i;
    }
  }
}

}  // namespace

std::unique_ptr<XmlNode> parse_xml(const std::string& text, std::string* error) {
  Cursor c{text};
  skip_misc(c);
  auto root = parse_element(c, error);
  return root;
}

}  // namespace dwbc_host
