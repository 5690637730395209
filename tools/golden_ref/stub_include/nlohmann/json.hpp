// Minimal stand-in for nlohmann::json (submodule not checked out in the
// read-only reference).  Only what the reference tree-search headers'
// (unused at runtime) JSON_SAVE/JSON_LOAD helpers need to COMPILE:
// operator[], find/end, templated assign/convert, size, dump.
#pragma once

#include <cstddef>
#include <string>
#include <type_traits>

namespace nlohmann {

struct json {
  struct iterator {
    bool operator==(const iterator&) const { return true; }
    bool operator!=(const iterator&) const { return false; }
  };

  json() = default;
  template <typename T>
  json(const T&) {}

  json& operator[](const char*) { return *this; }
  json& operator[](const std::string&) { return *this; }
  json& operator[](size_t) { return *this; }
  const json& operator[](const char*) const { return *this; }
  const json& operator[](const std::string&) const { return *this; }
  const json& operator[](size_t) const { return *this; }

  template <typename T>
  json& operator=(const T&) { return *this; }

  template <typename T,
            typename = std::enable_if_t<std::is_arithmetic<T>::value &&
                                        !std::is_same<T, char>::value>>
  operator T() const { return T(); }
  operator std::string() const { return {}; }

  iterator find(const char*) const { return {}; }
  iterator find(const std::string&) const { return {}; }
  iterator end() const { return {}; }
  size_t size() const { return 0; }
  std::string dump(int = 0) const { return "{}"; }

  static json parse(const std::string&) { return {}; }
};

} // namespace nlohmann
