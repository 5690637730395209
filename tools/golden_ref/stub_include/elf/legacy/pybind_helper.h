// Stub for the reference's pybind registration macros (the real header
// needs pybind11, absent here).  The macro expands to a template member
// that is never instantiated by the golden generators.
#pragma once

#define REGISTER_PYBIND_FIELDS(...)            \
  template <typename Class>                    \
  static Class& register_fields(Class&& mod) { \
    return mod;                                \
  }

#define REGISTER_PYBIND REGISTER_PYBIND_FIELDS()
