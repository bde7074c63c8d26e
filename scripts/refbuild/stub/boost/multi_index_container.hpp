// minimal multi_index_container: the only in-tree user (InsOrderedMap)
// exercises just the insertion-order (random_access) index, so a vector
// with a self-returning get<N>() suffices (scratch parity build)
#ifndef STUB_BOOST_MULTI_INDEX
#define STUB_BOOST_MULTI_INDEX 1
#include <vector>
#include <cstddef>
namespace boost { namespace multi_index {
template <class... T> struct random_access {};
template <class T, class C, C T::*Ptr> struct member {};
template <class... T> struct ordered_unique {};
template <class... T> struct indexed_by {};
template <class Value, class Indexes>
class multi_index_container : public std::vector<Value> {
  public:
	// insertion-order iteration is read-only in the real container
	typedef typename std::vector<Value>::const_iterator iterator;
	template <int N> struct nth_index { typedef multi_index_container type; };
	template <int N> const multi_index_container& get() const { return *this; }
	template <int N> multi_index_container& get() { return *this; }
};
} }
#endif
