#ifndef STUB_BOOST_REF
#define STUB_BOOST_REF 1
#include <functional>
namespace boost {
using std::ref;
using std::cref;
template <class T> using reference_wrapper = std::reference_wrapper<T>;
}
#endif
