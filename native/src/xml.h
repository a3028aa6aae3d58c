// Minimal non-validating XML parser — just enough for URDF files.
// No external dependencies (the image has no tinyxml2); handles elements,
// attributes, comments, CDATA-free documents.
#pragma once

#include <memory>
#include <string>
#include <vector>

namespace dwbc_host {

struct XmlNode {
  std::string tag;
  std::vector<std::pair<std::string, std::string>> attrs;
  std::vector<std::unique_ptr<XmlNode>> children;

  const std::string* attr(const std::string& key) const {
    for (auto& kv : attrs)
      if (kv.first == key) return &kv.second;
    return nullptr;
  }
  std::vector<const XmlNode*> find_all(const std::string& t) const {
    std::vector<const XmlNode*> out;
    for (auto& c : children)
      if (c->tag == t) out.push_back(c.get());
    return out;
  }
  const XmlNode* find(const std::string& t) const {
    for (auto& c : children)
      if (c->tag == t) return c.get();
    return nullptr;
  }
};

// Parse an XML document; returns the root element or nullptr on error.
std::unique_ptr<XmlNode> parse_xml(const std::string& text, std::string* error);

}  // namespace dwbc_host
